package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q151: MEDIAN ABSOLUTE DEVIATION robust outlier detection — the
  * breakdown-point-0.5 dispersion statistic (Hampel 1974, public)
  * behind every telemetry anomaly gate that can't trust stddev
  * (one wild value inflates σ and hides itself; the MAD doesn't
  * move): per event type, med = median(x), MAD = median(|x − med|),
  * and the robust-z outlier count |x − med| > 3·1.4826·MAD (1.4826
  * is the Gaussian consistency constant). Complements q125
  * (winsorize clamps at fixed quantiles; MAD ADAPTS the fence to the
  * clean mass) and q109 (IQR fences on a compressed integer domain).
  *
  * Two-pass shape: median per group (the q10/q125 exact sorted-array
  * interpolation, mirrored verbatim — bit-exact), one-row-per-group
  * medians BROADCAST back, then the deviation pass collects the
  * |x − med| array ONCE and derives MAD + the outlier count from the
  * SAME array (an array filter — no third scan of the fact). Arrays
  * are GROUP-sized — the documented q10 trade; `exact = false` swaps
  * both medians to `approx_percentile` sketches and the outlier
  * count to a broadcast-fence conditional aggregate, the 100 TB
  * default with NO array anywhere.
  *
  * Determinism: med and MAD are exact mirrored interpolations; the
  * threshold 3·1.4826·MAD is written as the single literal 4.4478 ×
  * MAD on both sides (one IEEE product); counts are exact integers
  * and the rate one integer division.
  */
object Mad {

  /** Per-group MAD outlier report over double `valCol`. */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      exact: Boolean = true): DataFrame = {
    val v = df.filter(col(valCol).isNotNull).select(col(groupCol), col(valCol))
    val medians =
      if (exact)
        v.groupBy(col(groupCol))
          .agg(sort_array(collect_list(col(valCol))).as("graft_arr"),
            count(lit(1)).as("n"))
          .select(col(groupCol), col("n"),
            det.dpercentile(col("graft_arr"), col("n"), 0.5).as("med"))
      else
        v.groupBy(col(groupCol))
          .agg(count(lit(1)).as("n"),
            approx_percentile(col(valCol), lit(0.5), lit(10000)).as("med"))
    val devs = v.join(broadcast(medians), Seq(groupCol))
      .withColumn("graft_dev", abs(col(valCol) - col("med")))
    if (exact) {
      devs
        .groupBy(col(groupCol))
        .agg(
          max(col("n")).as("n"),
          max(col("med")).as("med"),
          sort_array(collect_list(col("graft_dev"))).as("graft_darr"))
        .withColumn("mad", det.dpercentile(col("graft_darr"), col("n"), 0.5))
        .withColumn("n_outliers",
          size(filter(col("graft_darr"), d => d > col("mad") * lit(4.4478))).cast("long"))
        .select(col(groupCol), col("n"), col("med"), col("mad"), col("n_outliers"),
          (col("n_outliers").cast("double") / col("n").cast("double")).as("outlier_rate"))
    } else {
      val fences = devs.groupBy(col(groupCol))
        .agg(max(col("n")).as("n"), max(col("med")).as("med"),
          approx_percentile(col("graft_dev"), lit(0.5), lit(10000)).as("mad"))
      devs.select(col(groupCol), col("graft_dev"))
        .join(broadcast(fences), Seq(groupCol))
        .groupBy(col(groupCol))
        .agg(max(col("n")).as("n"), max(col("med")).as("med"), max(col("mad")).as("mad"),
          sum(when(col("graft_dev") > col("mad") * lit(4.4478), 1L).otherwise(0L))
            .as("n_outliers"))
        .withColumn("outlier_rate",
          col("n_outliers").cast("double") / col("n").cast("double"))
    }
  }

  val q151 = Q.of(
    "q151_mad_outliers",
    """WITH v AS (
      |  SELECT event_type, value FROM events WHERE value IS NOT NULL
      |), g AS (
      |  SELECT event_type, list_sort(list(value)) AS arr, COUNT(*) AS n
      |  FROM v GROUP BY event_type
      |), meds AS (
      |  SELECT event_type, n,
      |    arr[1 + CAST(floor(0.5 * CAST(n - 1 AS DOUBLE)) AS INT)]
      |      + (arr[1 + CAST(ceil(0.5 * CAST(n - 1 AS DOUBLE)) AS INT)]
      |         - arr[1 + CAST(floor(0.5 * CAST(n - 1 AS DOUBLE)) AS INT)])
      |        * (0.5 * CAST(n - 1 AS DOUBLE) - floor(0.5 * CAST(n - 1 AS DOUBLE))) AS med
      |  FROM g
      |), d AS (
      |  SELECT v.event_type, m.n, m.med, abs(v.value - m.med) AS dev
      |  FROM v JOIN meds m ON v.event_type = m.event_type
      |), dg AS (
      |  SELECT event_type, MAX(n) AS n, MAX(med) AS med,
      |    list_sort(list(dev)) AS darr
      |  FROM d GROUP BY event_type
      |), scored AS (
      |  SELECT event_type, n, med,
      |    darr[1 + CAST(floor(0.5 * CAST(n - 1 AS DOUBLE)) AS INT)]
      |      + (darr[1 + CAST(ceil(0.5 * CAST(n - 1 AS DOUBLE)) AS INT)]
      |         - darr[1 + CAST(floor(0.5 * CAST(n - 1 AS DOUBLE)) AS INT)])
      |        * (0.5 * CAST(n - 1 AS DOUBLE) - floor(0.5 * CAST(n - 1 AS DOUBLE))) AS mad,
      |    darr
      |  FROM dg
      |)
      |SELECT event_type,
      |  CAST(n AS BIGINT) AS n,
      |  med, mad,
      |  CAST(len(list_filter(darr, x -> x > mad * 4.4478)) AS BIGINT) AS n_outliers,
      |  CAST(len(list_filter(darr, x -> x > mad * 4.4478)) AS DOUBLE)
      |    / CAST(n AS DOUBLE) AS outlier_rate
      |FROM scored
      |ORDER BY event_type""".stripMargin) { t =>
    madOutliers(t.events, "event_type", "value").orderBy(col("event_type"))
  }

  def all: Seq[Q] = Seq(q151)
}
