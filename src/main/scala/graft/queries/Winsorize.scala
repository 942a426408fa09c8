package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det
import graft.functions.det.dsum

/** q125: WINSORIZED robust statistics — the outlier-clamped moment
  * pass every metrics/feature pipeline runs before fitting anything
  * to heavy-tailed telemetry: per group, find the p05/p95 fences,
  * CLAMP (not drop — winsorize, so the row count is preserved and
  * downstream joins keep their grain) every value into [p05, p95],
  * and report the clamped mean alongside how many rows each fence
  * touched. The IQR-fence twin is q109 (which COUNTS outliers on a
  * compressed integer domain); this one rewrites the value column
  * itself on the raw continuous domain.
  *
  * Two-pass shape, both passes scale-clean in different ways:
  *  1. fences: exact p05/p95 via `det.dpercentile` — the explicit
  *     sorted-array interpolation mirrored verbatim in the oracle so
  *     every IEEE op is identical cross-engine (bit-exact, no
  *     rounding). The array is GROUP-sized, the documented q10
  *     trade; `exact = false` swaps in `approx_percentile` (one-pass
  *     sketch, fixed state — the 100 TB default, pinned in
  *     OperatorsSpec plan-shape-for-plan-shape).
  *  2. clamp + re-aggregate: the one-row-per-group fence frame is
  *     BROADCAST back onto the fact (no fact-sized exchange), the
  *     clamp is a codegen'd `greatest/least` projection, and the
  *     winsorized moments ride one bounded rollup via decimal-exact
  *     sums (det.dsum). This is the q109 re-aggregation discipline:
  *     no per-group array survives past the fence pass.
  */
object Winsorize {

  /** Fences + winsorized stats per `groupCol` over double `valCol`.
    * Factored so the spec can pin hand-computable fixtures and the
    * approx form's plan shape.
    */
  def winsorized(
      df: DataFrame, groupCol: String, valCol: String,
      lo: Double, hi: Double, exact: Boolean = true): DataFrame = {
    val v = df.filter(col(valCol).isNotNull).select(col(groupCol), col(valCol))
    val fences =
      if (exact) {
        v.groupBy(col(groupCol))
          .agg(sort_array(collect_list(col(valCol))).as("arr"),
            count(lit(1)).as("n"))
          .select(col(groupCol), col("n"),
            det.dpercentile(col("arr"), col("n"), lo).as("p_lo"),
            det.dpercentile(col("arr"), col("n"), hi).as("p_hi"))
      } else {
        v.groupBy(col(groupCol))
          .agg(count(lit(1)).as("n"),
            approx_percentile(col(valCol), lit(lo), lit(10000)).as("p_lo"),
            approx_percentile(col(valCol), lit(hi), lit(10000)).as("p_hi"))
      }
    v.join(broadcast(fences), Seq(groupCol))
      .withColumn("wv", greatest(col("p_lo"), least(col("p_hi"), col(valCol))))
      .groupBy(col(groupCol))
      .agg(
        max(col("n")).as("n"),
        max(col("p_lo")).as("p_lo"),
        max(col("p_hi")).as("p_hi"),
        (dsum(col("wv")) / max(col("n"))).as("w_mean"),
        sum(when(col(valCol) < col("p_lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col(valCol) > col("p_hi"), 1L).otherwise(0L)).as("n_clip_hi"))
  }

  val q125 = Q.of(
    "q125_winsorize",
    """WITH v AS (
      |  SELECT event_type, value FROM events WHERE value IS NOT NULL
      |), g AS (
      |  SELECT event_type, list_sort(list(value)) AS arr, COUNT(*) AS n
      |  FROM v GROUP BY event_type
      |), f AS (
      |  SELECT event_type, n,
      |    arr[1 + CAST(floor(0.05 * CAST(n - 1 AS DOUBLE)) AS INT)]
      |      + (arr[1 + CAST(ceil(0.05 * CAST(n - 1 AS DOUBLE)) AS INT)]
      |         - arr[1 + CAST(floor(0.05 * CAST(n - 1 AS DOUBLE)) AS INT)])
      |        * (0.05 * CAST(n - 1 AS DOUBLE) - floor(0.05 * CAST(n - 1 AS DOUBLE))) AS p_lo,
      |    arr[1 + CAST(floor(0.95 * CAST(n - 1 AS DOUBLE)) AS INT)]
      |      + (arr[1 + CAST(ceil(0.95 * CAST(n - 1 AS DOUBLE)) AS INT)]
      |         - arr[1 + CAST(floor(0.95 * CAST(n - 1 AS DOUBLE)) AS INT)])
      |        * (0.95 * CAST(n - 1 AS DOUBLE) - floor(0.95 * CAST(n - 1 AS DOUBLE))) AS p_hi
      |  FROM g
      |)
      |SELECT v.event_type, f.n, f.p_lo, f.p_hi,
      |  CAST(SUM(CAST(greatest(f.p_lo, least(f.p_hi, v.value)) AS DECIMAL(20,6))) AS DOUBLE) / f.n AS w_mean,
      |  CAST(SUM(CASE WHEN v.value < f.p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
      |  CAST(SUM(CASE WHEN v.value > f.p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi
      |FROM v JOIN f USING (event_type)
      |GROUP BY v.event_type, f.n, f.p_lo, f.p_hi
      |ORDER BY event_type""".stripMargin) { t =>
    winsorized(t.events, "event_type", "value", 0.05, 0.95)
      .orderBy(col("event_type"))
  }

  def all: Seq[Q] = Seq(q125)
}
