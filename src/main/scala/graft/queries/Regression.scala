package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det.{dsumw, dcorr}

/** q130: GROUP-WISE LINEAR REGRESSION — per-group OLS fit (slope,
  * intercept, r²) in ONE aggregation pass over exact decimal moments,
  * the closed-form y = a + bx every "does volume drive value"
  * analysis reaches for (the model-fitting generalization of q11's
  * corr; the reference's predictive analysis consumes exactly these
  * shapes as features). SQL engines expose this as
  * regr_slope/regr_intercept/regr_r2 — here the moments are computed
  * with the det.dsumw decimal routing so the identical IEEE
  * expressions on both engines make the result bit-stable before the
  * presentation round.
  *
  * Scale shape: the entire fit is ONE map-side-combined aggregate
  * over the fact (five decimal sums + a count per group — constant
  * state, no arrays, no second pass) into a bounded group frame.
  * This is the textbook "sufficient statistics" pattern: at 100 TB
  * the only exchange carries six numbers per group.
  */
object Regression {

  /** slope/intercept/r² of y on x per group from exact decimal
    * moments. Factored so the spec can pin a hand-computed exact fit
    * (collinear points → r² = 1) and a known-slope fixture.
    */
  def fit(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame = {
    val n  = count(lit(1)).cast("double")
    val sx = dsumw(x);     val sy = dsumw(y)
    val sxx = dsumw(x * x); val sxy = dsumw(x * y)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        round(slope, 4).as("slope"),
        round((sy - slope * sx) / n, 4).as("intercept"),
        round(dcorr(x, y) * dcorr(x, y), 4).as("r2"))
  }

  val q130 = Q.of(
    "q130_groupwise_regression",
    """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS slope,
      |  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 4) AS intercept,
      |  round(((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)))
      |    * ((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))), 4) AS r2
      |FROM (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |ORDER BY l_returnflag""".stripMargin) { t =>
    fit(t.lineitem, "l_returnflag", col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_returnflag"))
  }

  def all: Seq[Q] = Seq(q130)
}
