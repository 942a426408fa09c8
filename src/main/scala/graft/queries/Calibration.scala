package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q191: CALIBRATION bins + Brier score — the reliability readout
  * beside q190's AUC: ranking quality (AUC) says nothing about
  * whether a score of 0.8 actually means 80%, and every downstream
  * consumer that THRESHOLDS a quality/classifier score (q84, q95,
  * q117, q121's funnel) implicitly assumes calibration. Standard
  * reliability-diagram binning (DeGroot & Fienberg 1983) + the Brier
  * mean-squared score, per decile bin.
  *
  * The "probability" under audit is the discount-derived propensity
  * p = l_discount · 10 (a deterministic [0,1] score with real tie
  * blocks at each percent), predicting l_returnflag = 'R'.
  *
  * Determinism: bin = min(⌊p·10⌋, 9) is IEEE-then-integer, identical
  * tokens both engines; per-bin Σp and Σ(p−y)² are D20_6-quantized
  * per element then summed exactly (§6 routing — order-independent,
  * no half-ties: the squares of {0.0,…,1.0}±binary-noise never land
  * on a 1e-6 midpoint); mean_p, frac_pos, gap, brier are single IEEE
  * ops over exact decimal/integer operands, no rounding.
  *
  * Scale shape: ONE fact scan folding straight into ≤10 bin cells
  * (map-side combined — bins, not rows, cross the exchange); nothing
  * else. This is the cheapest possible full-corpus audit: the same
  * shape a 100 TB run would use, with the exchange carrying 10 rows.
  */
object Calibration {

  /** Reliability bins of probability `p` against outcome `y`, decile
    * bins. Emits (bin, n, pos, mean_p, frac_pos, gap, brier) —
    * factored so the spec can pin hand-computed bins, the perfect /
    * anti-calibrated extremes, and the p = 1.0 top-bin clamp.
    */
  def reliabilityBins(df: DataFrame, p: Column, y: Column): DataFrame = {
    val yd = when(y, lit(1.0)).otherwise(lit(0.0))
    df.select(
        least(floor(p * 10.0).cast("int"), lit(9)).as("bin"),
        p.as("graft_p"),
        yd.as("graft_y"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("graft_y").cast("long")).as("pos"),
        sum(col("graft_p").cast(det.D20_6)).as("graft_sp"),
        sum(((col("graft_p") - col("graft_y")) * (col("graft_p") - col("graft_y")))
          .cast(det.D20_6)).as("graft_sq"))
      .select(
        col("bin"), col("n"), col("pos"),
        (col("graft_sp").cast("double") / col("n").cast("double")).as("mean_p"),
        (col("pos").cast("double") / col("n").cast("double")).as("frac_pos"),
        (col("pos").cast("double") / col("n").cast("double") -
          col("graft_sp").cast("double") / col("n").cast("double")).as("gap"),
        (col("graft_sq").cast("double") / col("n").cast("double")).as("brier"))
  }

  val q191 = Q.of(
    "q191_calibration",
    """WITH s AS (
      |  SELECT LEAST(CAST(FLOOR(l_discount * 10.0 * 10.0) AS INT), 9) AS bin,
      |    l_discount * 10.0 AS p,
      |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
      |  FROM lineitem
      |), b AS (
      |  SELECT bin, COUNT(*) AS n,
      |    CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS pos,
      |    SUM(CAST(p AS DECIMAL(20,6))) AS sp,
      |    SUM(CAST((p - y) * (p - y) AS DECIMAL(20,6))) AS sq
      |  FROM s GROUP BY bin
      |)
      |SELECT bin, n, pos,
      |  CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS mean_p,
      |  CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
      |  CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
      |    - CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS gap,
      |  CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS brier
      |FROM b
      |ORDER BY bin""".stripMargin) { t =>
    reliabilityBins(
      t.lineitem.select(col("l_discount"), col("l_returnflag")),
      col("l_discount") * 10.0,
      col("l_returnflag") === "R")
      .orderBy(col("bin"))
  }

  def all: Seq[Q] = Seq(q191)
}
