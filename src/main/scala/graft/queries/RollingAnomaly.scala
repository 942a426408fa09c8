package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q200: ROLLING ROBUST ANOMALY detection over the daily revenue
  * series — the time-series twin of q151's global MAD outliers and
  * the alerting layer over q138's CUSUM changepoints: each day
  * scored against the TRAILING week's median/MAD (never against the
  * future, never against itself — the causal convention a production
  * monitor needs), robust z = (x − med)/(1.4826·MAD) (Hampel filter,
  * public), |z| > 3 flags.
  *
  * Determinism: daily revenue is an exact D20_6 sum cast double; the
  * trailing 7 values ride a bounded ROWS window as a SORTED ARRAY
  * and med/MAD use det.dpercentile's explicit interpolation written
  * token-identically in the oracle (q58's rule — engine-internal
  * median implementations disagree at ties); the deviation array is
  * a lambda transform + sort with the SAME shape both engines; z is
  * one IEEE chain over identical doubles. Warmup rows (< 7 prior
  * days) and MAD = 0 guard score to NULL — a flat week makes "3
  * MADs" meaningless and says so instead of dividing by zero.
  *
  * Scale shape: the series is PRE-AGGREGATED to day grain (bounded
  * ~2.4k rows at any SF — one map-side-combined aggregate is the
  * only thing that touches the fact), then one ordered window with
  * O(W) state per row. A per-key variant partitions the same window
  * by the key; nothing grows with the corpus.
  */
object RollingAnomaly {

  private val W = 7

  /** Trailing-window robust z over an ordered (day, v) series.
    * Factored so the spec can pin hand-computed med/MAD on a planted
    * spike, the causal (trailing-only) convention, the warmup guard,
    * and the MAD = 0 flat-week guard.
    */
  def robustZ(series: DataFrame, w: Int = W): DataFrame = {
    val trail = Window.orderBy(col("day")).rowsBetween(-w, -1)
    val withArr = series
      .withColumn("graft_arr", sort_array(collect_list(col("v")).over(trail)))
      .withColumn("graft_n", size(col("graft_arr")))
    // the n = w guard wraps the WHOLE percentile expression: ANSI mode
    // turns element_at on the empty warmup array into an error, so the
    // interpolation must never be evaluated on short windows
    val withMed = withArr
      .withColumn("graft_med",
        when(col("graft_n") === w,
          det.dpercentile(col("graft_arr"), col("graft_n"), 0.5)))
      .withColumn("graft_dev",
        sort_array(transform(col("graft_arr"),
          x => abs(x - col("graft_med")))))
      .withColumn("graft_mad",
        when(col("graft_n") === w,
          det.dpercentile(col("graft_dev"), col("graft_n"), 0.5)))
    withMed
      .select(
        col("day"), col("v"), col("graft_med").as("med"),
        col("graft_mad").as("mad"),
        when(col("graft_mad") > 0.0,
          (col("v") - col("graft_med")) / (lit(1.4826) * col("graft_mad")))
          .as("z"))
      .withColumn("is_anomaly",
        when(col("z").isNotNull, abs(col("z")) > 3.0))
  }

  val q200 = Q.of(
    "q200_rolling_anomaly",
    s"""WITH series AS (
      |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS v
      |  FROM orders GROUP BY 1
      |), arrs AS (
      |  SELECT day, v,
      |    list_sort(list(v) OVER
      |      (ORDER BY day ROWS BETWEEN $W PRECEDING AND 1 PRECEDING)) AS arr
      |  FROM series
      |), sized AS (
      |  SELECT day, v, arr, len(arr) AS n FROM arrs
      |), med AS (
      |  SELECT day, v, arr, n,
      |    arr[CAST(FLOOR(0.5 * CAST(n - 1 AS DOUBLE)) AS INT) + 1]
      |      + (arr[CAST(CEIL(0.5 * CAST(n - 1 AS DOUBLE)) AS INT) + 1]
      |         - arr[CAST(FLOOR(0.5 * CAST(n - 1 AS DOUBLE)) AS INT) + 1])
      |        * (0.5 * CAST(n - 1 AS DOUBLE)
      |           - FLOOR(0.5 * CAST(n - 1 AS DOUBLE))) AS m
      |  FROM sized
      |), dev AS (
      |  SELECT day, v, n, m,
      |    list_sort(list_transform(arr, x -> abs(x - m))) AS darr
      |  FROM med
      |), madx AS (
      |  SELECT day, v, n, m,
      |    darr[CAST(FLOOR(0.5 * CAST(n - 1 AS DOUBLE)) AS INT) + 1]
      |      + (darr[CAST(CEIL(0.5 * CAST(n - 1 AS DOUBLE)) AS INT) + 1]
      |         - darr[CAST(FLOOR(0.5 * CAST(n - 1 AS DOUBLE)) AS INT) + 1])
      |        * (0.5 * CAST(n - 1 AS DOUBLE)
      |           - FLOOR(0.5 * CAST(n - 1 AS DOUBLE))) AS md
      |  FROM dev
      |), scored AS (
      |  SELECT day, v,
      |    CASE WHEN n = $W THEN m END AS med,
      |    CASE WHEN n = $W THEN md END AS mad,
      |    CASE WHEN n = $W AND md > 0.0
      |      THEN (v - m) / (1.4826 * md) END AS z
      |  FROM madx
      |)
      |SELECT day, v, med, mad, z,
      |  CASE WHEN z IS NOT NULL THEN abs(z) > 3.0 END AS is_anomaly
      |FROM scored
      |ORDER BY day""".stripMargin) { t =>
    val series = t.orders
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(det.D20_6)).cast("double").as("v"))
    robustZ(series).orderBy(col("day"))
  }

  def all: Seq[Q] = Seq(q200)
}
