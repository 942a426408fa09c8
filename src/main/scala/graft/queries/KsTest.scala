package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.PrefixSum

/** q171: TWO-SAMPLE KOLMOGOROV–SMIRNOV distance — do two customer
  * segments draw their order values from the same distribution? The
  * DISTRIBUTION-level A/B readout beside q74 (mean-difference test)
  * and q165 (categorical association): D = max_x |F̂₁(x) − F̂₂(x)|
  * is sensitive to shape/location/spread shifts a mean test misses
  * (Kolmogorov 1933 / Smirnov 1939, public). Output also names
  * x_at_max — WHERE the distributions diverge most, the actionable
  * part for an analyst.
  *
  * Determinism — the whole statistic is computed in INTEGER
  * arithmetic: at each observed value, |cum₁·n₂ − cum₂·n₁| is an
  * exact int64 (the float form |cum₁/n₁ − cum₂/n₂| accumulates two
  * divisions per step and its argmax can flip on a 1-ulp tie); D
  * itself is ONE IEEE division at the end, round 6. Argmax ties
  * break to the SMALLEST value via a single max(struct(num, −v))
  * fold — no second pass. Products are bounded by n₁·n₂ (int64-safe
  * through ~3·10⁹ rows per side; past that, route the two products
  * through DECIMAL(38,0) — same shape, wider lanes).
  *
  * Scale shape: one map-side-combined per-value count aggregate
  * (distinct metric values, not rows, cross the exchange), then the
  * TWO cumulative sums ride one
  * [[graft.operators.PrefixSum.orderedRunningSums]] pass — range
  * exchange + bounded driver offsets + per-partition windows, never
  * a single-task global window: the cent-granular value alphabet is
  * data-sized (≈ one cell per order until domain saturation), the
  * exact q182 frame class. Totals are a one-row broadcast; the rest
  * is a single-row fold. The segment filter and 2-column projection
  * push into the scans; the dim join broadcasts.
  */
object KsTest {

  private val SegA = "BUILDING"
  private val SegB = "MACHINERY"

  /** Exact KS distance between the `v` distributions of the rows
    * where `isA` holds vs the rest. Factored so the spec can pin
    * hand-computed ECDF gaps, the tie-at-max rule, and identical
    * samples (D = 0).
    */
  def ksDistance(df: DataFrame, isA: Column, v: Column): DataFrame = {
    val cells = df.select(isA.as("graft_a"), v.as("graft_v"))
      .groupBy(col("graft_v"))
      .agg(
        sum(when(col("graft_a"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("graft_a"), 1L).otherwise(0L)).as("c2"))
    // BOTH ECDF cumsums ride ONE range exchange + driver-offset pass
    // — the value alphabet of o_totalprice is cent-granular and grows
    // ~1:1 with the order count until domain saturation (measured
    // 1500/15k/150k distinct at sf0.001/0.01/0.1), so this frame is
    // DATA-SIZED and a bare Window.orderBy would collapse it into one
    // task — the q182/q157 scale-killer class, caught by the round-13
    // whitelist re-audit
    val cum = PrefixSum.orderedRunningSums(
      cells, orderBy = Seq(col("graft_v")),
      values = Seq(col("c1") -> "cum1", col("c2") -> "cum2"),
      numPartitions = 8)
    // totals are the cumsums' maxima over the SAME cached frame; they
    // ride a one-row broadcast, never an empty-partition window
    val tot = cum.agg(
      coalesce(max(col("cum1")), lit(0L)).as("n1"),
      coalesce(max(col("cum2")), lit(0L)).as("n2"))
    cum.crossJoin(broadcast(tot))
      .withColumn("graft_num",
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .agg(
        max(struct(col("graft_num").as("num"), (-col("graft_v")).as("negv"))).as("m"),
        first(col("n1")).as("n1"),
        first(col("n2")).as("n2"))
      .select(
        col("n1"),
        col("n2"),
        col("m.num").as("d_num"),
        round(col("m.num").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double")), 6).as("d_stat"),
        (-col("m.negv")).as("x_at_max"))
  }

  val q171 = Q.of(
    "q171_ks_test",
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
      |  SELECT v,
      |    SUM(c1) OVER (ORDER BY v) AS cum1,
      |    SUM(c2) OVER (ORDER BY v) AS cum2,
      |    SUM(c1) OVER () AS n1,
      |    SUM(c2) OVER () AS n2
      |  FROM c
      |)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(ABS(cum1 * n2 - cum2 * n1) AS BIGINT) AS d_num,
      |  round(CAST(ABS(cum1 * n2 - cum2 * n1) AS DOUBLE)
      |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d_stat,
      |  v AS x_at_max
      |FROM cum
      |ORDER BY ABS(cum1 * n2 - cum2 * n1) DESC, v ASC
      |LIMIT 1""".stripMargin) { t =>
    ksDistance(
      t.orders
        .join(broadcast(t.customer
          .filter(col("c_mktsegment").isin(SegA, SegB))
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_totalprice")),
      col("c_mktsegment") === SegA,
      col("o_totalprice"))
  }

  def all: Seq[Q] = Seq(q171)
}
