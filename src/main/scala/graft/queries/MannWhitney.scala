package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.PrefixSum

/** q172: MANN–WHITNEY U rank-sum test — does one customer segment
  * systematically place larger orders than another? The
  * NON-PARAMETRIC location test beside q74 (mean difference, needs
  * normality) and q171 (KS, any-shape divergence): U compares
  * MEDIANS-ish via ranks, so a handful of whale orders can't drag
  * the verdict the way they drag a mean (Mann–Whitney 1947,
  * public). Emits the tie-corrected normal approximation z.
  *
  * Determinism — ranks never materialize as floats: a tie block at
  * value v with ct members spanning positions [cb+1, cb+ct] has
  * average rank (2·cb+ct+1)/2, so TWICE the rank sum,
  * 2R₁ = Σ c₁·(2·cb+ct+1), is an exact int64 (the .5 fractions the
  * textbook tables show never exist here); 2U₁ = 2R₁ − n₁(n₁+1)
  * likewise. The tie-correction term Σ(t³−t) is an exact integer
  * fold over tie-block sizes. z is then a FIXED sequence of IEEE
  * ops from exact integer inputs — written token-identically in the
  * oracle so both engines emit the same double — round 4; σ = 0
  * (every observation tied) guards to NULL explicitly on both
  * sides.
  *
  * Scale shape: identical to q171 — per-value count aggregate
  * (map-side combined, distinct values cross the exchange), then the
  * tie-block-base cumsum rides
  * [[graft.operators.PrefixSum.orderedRunningSum]] (range exchange +
  * bounded driver offsets + per-partition windows, NEVER a
  * single-task global window — the cent-granular value alphabet is
  * data-sized, q182's frame class), single-row fold. t³ bounds
  * the int64 range to ~2·10⁶ rows in one tie block per 10¹⁸ —
  * beyond that, DECIMAL(38,0) lanes (same shape).
  */
object MannWhitney {

  private val SegA = "AUTOMOBILE"
  private val SegB = "HOUSEHOLD"

  /** Tie-corrected Mann–Whitney U of `v` for `isA` rows vs the rest.
    * Factored so the spec can pin textbook rank sums, the all-tied
    * NULL-z guard, and the U₁ + U₂ = n₁·n₂ identity.
    */
  def uTest(df: DataFrame, isA: Column, v: Column): DataFrame = {
    val cells = df.select(isA.as("graft_a"), v.as("graft_v"))
      .groupBy(col("graft_v"))
      .agg(
        sum(when(col("graft_a"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("graft_a"), 1L).otherwise(0L)).as("c2"))
      .withColumn("ct", col("c1") + col("c2"))
    PrefixSum.orderedRunningSum(
      cells, orderBy = Seq(col("graft_v")),
      value = col("ct"), outCol = "graft_cumct", numPartitions = 8)
      .withColumn("graft_cb", col("graft_cumct") - col("ct"))
      .agg(
        sum(col("c1")).as("n1"),
        sum(col("c2")).as("n2"),
        sum(col("c1") * (lit(2) * col("graft_cb") + col("ct") + 1)).as("two_r1"),
        sum(col("ct") * col("ct") * col("ct") - col("ct")).as("graft_ties"))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("u1_x2", col("two_r1") - col("n1") * (col("n1") + 1))
      .withColumn("graft_sig2",
        (col("n1").cast("double") * col("n2").cast("double") / lit(12.0)) *
          ((col("n") + 1).cast("double") -
            col("graft_ties").cast("double") /
              (col("n").cast("double") * (col("n") - 1).cast("double"))))
      .select(
        col("n1"),
        col("n2"),
        col("two_r1"),
        col("u1_x2"),
        when(col("graft_sig2") > 0.0,
          round((col("u1_x2").cast("double") -
            col("n1").cast("double") * col("n2").cast("double")) /
            (lit(2.0) * sqrt(col("graft_sig2"))), 4))
          .otherwise(lit(null).cast("double")).as("z"))
  }

  val q172 = Q.of(
    "q172_mann_whitney",
    s"""WITH s AS (
      |  SELECT c_mktsegment = '$SegA' AS a, o_totalprice AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('$SegA', '$SegB')
      |), c AS (
      |  SELECT v,
      |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN a THEN 0 ELSE 1 END) AS c2
      |  FROM s GROUP BY v
      |), cum AS (
      |  SELECT c1, c2, c1 + c2 AS ct,
      |    SUM(c1 + c2) OVER (ORDER BY v) - (c1 + c2) AS cb
      |  FROM c
      |), folded AS (
      |  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
      |    CAST(SUM(c1 * (2 * cb + ct + 1)) AS BIGINT) AS two_r1,
      |    CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS ties
      |  FROM cum
      |), u AS (
      |  SELECT n1, n2, two_r1, n1 + n2 AS n,
      |    two_r1 - n1 * (n1 + 1) AS u1_x2, ties
      |  FROM folded
      |), sig AS (
      |  SELECT n1, n2, two_r1, u1_x2,
      |    (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0) *
      |      (CAST(n + 1 AS DOUBLE) - CAST(ties AS DOUBLE)
      |        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sig2
      |  FROM u
      |)
      |SELECT n1, n2, two_r1, u1_x2,
      |  CASE WHEN sig2 > 0.0 THEN
      |    round((CAST(u1_x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
      |      / (2.0 * sqrt(sig2)), 4)
      |  ELSE NULL END AS z
      |FROM sig""".stripMargin) { t =>
    uTest(
      t.orders
        .join(broadcast(t.customer
          .filter(col("c_mktsegment").isin(SegA, SegB))
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_totalprice")),
      col("c_mktsegment") === SegA,
      col("o_totalprice"))
  }

  def all: Seq[Q] = Seq(q172)
}
