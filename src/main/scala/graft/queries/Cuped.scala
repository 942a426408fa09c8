package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q211: CUPED — variance-reduced experiment readout using
  * pre-experiment data (Deng, Xu, Kohavi & Walker, WSDM 2013,
  * public): the same units' PRE-period metric X explains away the
  * between-user variance that drowns small treatment effects, via
  * Ŷcv = Y − θ(X − X̄) with θ = cov(X,Y)/var(X) — the standard
  * industrial A/B power lever. Completes the experimentation tier:
  * q74 fixed-horizon readout, q181 DiD, q206 SPRT early stopping,
  * THIS the variance reduction all of them want. Emits the raw and
  * CUPED-adjusted effects, θ, and the variance fraction removed
  * (ρ² = corr(X,Y)²).
  *
  * Determinism: per-customer X (pre-period revenue) and Y
  * (experiment-period revenue) are exact D20_6 sums; arms are the
  * q79 md5-threshold split of the customer key (reproducible across
  * engines/cluster sizes); second-order moments quantize the
  * per-customer products X², XY, Y² at the customer surface (D28_6 —
  * the q192 wide lane) so every sum is exact; θ, effects, and ρ² are
  * FIXED IEEE chains over the exact moments, token-identical in the
  * oracle. var(X) = 0 guards to NULL.
  *
  * Scale shape: ONE orders scan builds both period metrics as
  * conditional sums (no second pass, no join); the exchange carries
  * customer cells; arm cells fold to ONE row. At 100 TB this is a
  * single map-side-combined aggregate plus a 2-row fold.
  */
object Cuped {

  /** CUPED over a (unit, x, y) frame with a deterministic md5 arm
    * split. Factored so the spec can pin the known-θ recovery, the
    * perfect-covariate collapse (ρ² = 1, cuped effect exactly the
    * planted lift), and the zero-variance guard.
    */
  def cuped(units: DataFrame, unit: Column, x: Column, y: Column): DataFrame = {
    val tagged = units
      .select(unit.as("graft_u"), x.as("graft_x"), y.as("graft_y"))
      .withColumn("graft_arm",
        when(md5(col("graft_u").cast("string")) < "80", "t").otherwise("c"))
    val cells = tagged
      .groupBy(col("graft_arm"))
      .agg(
        count(lit(1)).as("graft_n"),
        sum(col("graft_x").cast(det.D20_6)).as("graft_sx"),
        sum(col("graft_y").cast(det.D20_6)).as("graft_sy"),
        sum((col("graft_x").cast("double") * col("graft_x").cast("double"))
          .cast(det.D28_6)).as("graft_sxx"),
        sum((col("graft_x").cast("double") * col("graft_y").cast("double"))
          .cast(det.D28_6)).as("graft_sxy"),
        sum((col("graft_y").cast("double") * col("graft_y").cast("double"))
          .cast(det.D28_6)).as("graft_syy"))
    val f = cells.agg(
      sum(when(col("graft_arm") === "t", col("graft_n"))).as("n_t"),
      sum(when(col("graft_arm") === "c", col("graft_n"))).as("n_c"),
      sum(when(col("graft_arm") === "t", col("graft_sx"))).as("graft_sxt"),
      sum(when(col("graft_arm") === "c", col("graft_sx"))).as("graft_sxc"),
      sum(when(col("graft_arm") === "t", col("graft_sy"))).as("graft_syt"),
      sum(when(col("graft_arm") === "c", col("graft_sy"))).as("graft_syc"),
      sum(col("graft_n")).as("graft_n"),
      sum(col("graft_sx")).as("graft_sx"),
      sum(col("graft_sy")).as("graft_sy"),
      sum(col("graft_sxx")).as("graft_sxx"),
      sum(col("graft_sxy")).as("graft_sxy"),
      sum(col("graft_syy")).as("graft_syy"))
    val nD  = col("graft_n").cast("double")
    val sx  = col("graft_sx").cast("double")
    val sy  = col("graft_sy").cast("double")
    val sxx = col("graft_sxx").cast("double")
    val sxy = col("graft_sxy").cast("double")
    val syy = col("graft_syy").cast("double")
    val varx = nD * sxx - sx * sx
    val covn = nD * sxy - sx * sy
    val vary = nD * syy - sy * sy
    val theta = covn / varx
    val mxt = col("graft_sxt").cast("double") / col("n_t").cast("double")
    val mxc = col("graft_sxc").cast("double") / col("n_c").cast("double")
    val myt = col("graft_syt").cast("double") / col("n_t").cast("double")
    val myc = col("graft_syc").cast("double") / col("n_c").cast("double")
    f.select(
      col("n_t").cast("long").as("n_t"),
      col("n_c").cast("long").as("n_c"),
      when(varx > 0.0, theta).as("theta"),
      (myt - myc).as("effect_raw"),
      when(varx > 0.0, (myt - theta * mxt) - (myc - theta * mxc))
        .as("effect_cuped"),
      when(varx > 0.0 && vary > 0.0, covn * covn / (varx * vary))
        .as("var_reduction"))
  }

  val q211 = Q.of(
    "q211_cuped",
    """WITH units AS (
      |  SELECT o_custkey AS u,
      |    SUM(CAST(CASE WHEN o_orderdate >= DATE '1995-01-01'
      |             AND o_orderdate < DATE '1996-01-01'
      |        THEN o_totalprice ELSE 0 END AS DECIMAL(20,6))) AS x,
      |    SUM(CAST(CASE WHEN o_orderdate >= DATE '1996-01-01'
      |             AND o_orderdate < DATE '1997-01-01'
      |        THEN o_totalprice ELSE 0 END AS DECIMAL(20,6))) AS y
      |  FROM orders GROUP BY 1
      |), tagged AS (
      |  SELECT CASE WHEN md5(CAST(u AS VARCHAR)) < '80' THEN 't' ELSE 'c' END
      |    AS arm, x, y
      |  FROM units
      |), cells AS (
      |  SELECT arm, COUNT(*) AS n,
      |    SUM(CAST(x AS DECIMAL(20,6))) AS sx,
      |    SUM(CAST(y AS DECIMAL(20,6))) AS sy,
      |    SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
      |      AS DECIMAL(28,6))) AS sxx,
      |    SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
      |      AS DECIMAL(28,6))) AS sxy,
      |    SUM(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)
      |      AS DECIMAL(28,6))) AS syy
      |  FROM tagged GROUP BY 1
      |), f AS (
      |  SELECT
      |    SUM(CASE WHEN arm = 't' THEN n END) AS n_t,
      |    SUM(CASE WHEN arm = 'c' THEN n END) AS n_c,
      |    SUM(CASE WHEN arm = 't' THEN sx END) AS sxt,
      |    SUM(CASE WHEN arm = 'c' THEN sx END) AS sxc,
      |    SUM(CASE WHEN arm = 't' THEN sy END) AS syt,
      |    SUM(CASE WHEN arm = 'c' THEN sy END) AS syc,
      |    SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
      |    SUM(sxx) AS sxx, SUM(sxy) AS sxy, SUM(syy) AS syy
      |  FROM cells
      |)
      |SELECT
      |  CAST(n_t AS BIGINT) AS n_t,
      |  CAST(n_c AS BIGINT) AS n_c,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |         - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE) > 0.0
      |    THEN (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
      |          - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
      |       / (CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |          - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) END AS theta,
      |  CAST(CAST(syt AS VARCHAR) AS DOUBLE) / CAST(n_t AS DOUBLE)
      |    - CAST(CAST(syc AS VARCHAR) AS DOUBLE) / CAST(n_c AS DOUBLE) AS effect_raw,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |         - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE) > 0.0
      |    THEN (CAST(CAST(syt AS VARCHAR) AS DOUBLE) / CAST(n_t AS DOUBLE)
      |          - (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
      |             - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
      |            / (CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |               - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
      |            * (CAST(CAST(sxt AS VARCHAR) AS DOUBLE) / CAST(n_t AS DOUBLE)))
      |       - (CAST(CAST(syc AS VARCHAR) AS DOUBLE) / CAST(n_c AS DOUBLE)
      |          - (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
      |             - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
      |            / (CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |               - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
      |            * (CAST(CAST(sxc AS VARCHAR) AS DOUBLE) / CAST(n_c AS DOUBLE)))
      |    END AS effect_cuped,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |         - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE) > 0.0
      |        AND CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
      |         - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE) > 0.0
      |    THEN (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
      |          - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
      |       * (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
      |          - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
      |       / ((CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |           - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
      |          * (CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
      |             - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
      |    END AS var_reduction
      |FROM f""".stripMargin) { t =>
    cuped(
      t.orders.groupBy(col("o_custkey").as("u"))
        .agg(
          sum(when(col("o_orderdate") >= lit("1995-01-01").cast("date")
            && col("o_orderdate") < lit("1996-01-01").cast("date"),
            col("o_totalprice")).otherwise(lit(0)).cast(det.D20_6)).as("x"),
          sum(when(col("o_orderdate") >= lit("1996-01-01").cast("date")
            && col("o_orderdate") < lit("1997-01-01").cast("date"),
            col("o_totalprice")).otherwise(lit(0)).cast(det.D20_6)).as("y")),
      col("u"), col("x"), col("y"))
  }

  def all: Seq[Q] = Seq(q211)
}
