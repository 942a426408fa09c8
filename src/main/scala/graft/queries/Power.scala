package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q242: MDE / POWER PLANNING per segment — the PRE-experiment member
  * of the experimentation tier (standard two-sample power arithmetic,
  * Cohen/Lehr, public): q74/q192/q216 analyze a finished test, q211
  * shrinks its variance, q206 stops it early, q240 salvages a gated
  * one; this answers the question asked BEFORE any of them — with
  * this segment's outcome variance and n/2 per arm, what's the
  * minimum detectable effect at α = 0.05 / power 0.8, and how many
  * units per arm would a 1% lift need? MDE = (z_α/2 + z_β)·σ·√(2/n̄),
  * n_per_arm(δ) = 2σ²(z_α/2+z_β)²/δ².
  *
  * Determinism: moments are exact D20_6/D28_6 decimal sums with the
  * §6(k) VARCHAR bounce on the oracle casts (Σy² exceeds 2⁵³ scaled
  * at sf1); variance/σ/MDE are ONE fixed IEEE chain; the z constants
  * are written as the SAME literals on both sides (the q216
  * literal-parity rule — 1.96 + 0.8416 is evaluated identically, not
  * pre-folded to 2.8016); n_per_arm is ceil()'d identically.
  *
  * Scale shape: one orders scan → customer cells (map-side combined)
  * → |segments| moment rows → pure projection.
  */
object Power {

  val q242 = Q.of(
    "q242_mde_power",
    """WITH cust AS (
      |  SELECT c_custkey, c_mktsegment AS seg,
      |    SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS y
      |  FROM customer JOIN orders ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |), m AS (
      |  SELECT seg, COUNT(*) AS n,
      |    CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)
      |      AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS syy
      |  FROM cust GROUP BY seg
      |), v AS (
      |  SELECT seg, n, sy / CAST(n AS DOUBLE) AS mean_y,
      |    (CAST(n AS DOUBLE) * syy - sy * sy)
      |      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS var_y
      |  FROM m WHERE n >= 2
      |)
      |SELECT seg, n, mean_y, var_y,
      |  (1.96 + 0.8416) * sqrt(var_y)
      |    * sqrt(2.0 / (CAST(n AS DOUBLE) / 2.0)) AS mde_abs,
      |  (1.96 + 0.8416) * sqrt(var_y)
      |    * sqrt(2.0 / (CAST(n AS DOUBLE) / 2.0)) / mean_y AS mde_rel,
      |  CAST(ceil(2.0 * var_y * ((1.96 + 0.8416) * (1.96 + 0.8416))
      |    / ((0.01 * mean_y) * (0.01 * mean_y))) AS BIGINT)
      |    AS n_per_arm_1pct,
      |  CAST(ceil(2.0 * var_y * ((1.96 + 0.8416) * (1.96 + 0.8416))
      |    / ((0.05 * mean_y) * (0.05 * mean_y))) AS BIGINT)
      |    AS n_per_arm_5pct
      |FROM v
      |ORDER BY seg""".stripMargin) { t =>
    plan(t.customer, t.orders)
  }

  /** The planning readout over customer/orders frames. Factored so
    * the spec can pin the closed forms (zero variance → MDE 0; the
    * quarter-n quadruples-MDE² law) on hand fixtures.
    */
  def plan(customer: DataFrame, orders: DataFrame): DataFrame = {
    val cust = customer
      .join(orders, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment").as("seg"))
      .agg(sum(col("o_totalprice").cast(det.D20_6)).as("y"))
    val m = cust.groupBy(col("seg")).agg(
      count(lit(1)).as("n"),
      sum(col("y")).cast("double").as("sy"),
      sum((col("y").cast("double") * col("y").cast("double"))
        .cast(det.D28_6)).cast("double").as("syy"))
    val nd = col("n").cast("double")
    val meanY = col("sy") / nd
    val varY = (nd * col("syy") - col("sy") * col("sy")) /
      (nd * (col("n") - 1).cast("double"))
    val z = lit(1.96) + lit(0.8416)
    val base = m.filter(col("n") >= 2)
      .select(col("seg"), col("n"), meanY.as("mean_y"), varY.as("var_y"))
    val mde = z * sqrt(col("var_y")) *
      sqrt(lit(2.0) / (col("n").cast("double") / lit(2.0)))
    def nArm(f: Double) =
      ceil(lit(2.0) * col("var_y") * (z * z) /
        ((lit(f) * col("mean_y")) * (lit(f) * col("mean_y")))).cast("long")
    base.select(col("seg"), col("n"), col("mean_y"), col("var_y"),
        mde.as("mde_abs"),
        (mde / col("mean_y")).as("mde_rel"),
        nArm(0.01).as("n_per_arm_1pct"),
        nArm(0.05).as("n_per_arm_5pct"))
      .orderBy(col("seg"))
  }

  def all: Seq[Q] = Seq(q242)
}
