package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q153: THEIL-SEN robust trend estimation (Theil 1950, Sen 1968,
  * public) — the median of all pairwise slopes over the daily event
  * series, the trend line one outlier day CANNOT drag (OLS has
  * breakdown point 0; Theil-Sen tolerates 29 % corruption), reported
  * beside the OLS slope (q130's moments) so the gap itself is the
  * outlier diagnostic.
  *
  * Scale shape: the fact collapses to the daily frame in ONE
  * map-side-combined exchange; the O(days²) pair step runs over that
  * CALENDAR-BOUNDED frame only (435 pairs for a month, ~66 k for a
  * year — never fact²; for multi-decade series the published swap is
  * repeated median regression or slope sampling). One sorted-array
  * median over the slope list (the q125 interpolation discipline).
  *
  * Determinism: x is the integer epoch day and y the exact integer
  * daily count, so every pairwise slope is ONE IEEE division of exact
  * integers; the median interpolation is mirrored verbatim (bit-
  * exact); the OLS slope comes from exact integer moments with the
  * identical expression both sides. No rounding anywhere.
  */
object TheilSen {

  /** Theil-Sen + OLS slopes over an (integer x, integer y) series.
    * Factored so the spec can pin the outlier-immunity contrast.
    */
  def slopes(series: DataFrame, xCol: String, yCol: String): DataFrame = {
    val a = series.select(col(xCol).cast("long").as("x1"), col(yCol).cast("long").as("y1"))
    val b = series.select(col(xCol).cast("long").as("x2"), col(yCol).cast("long").as("y2"))
    val pairSlopes = a.join(b, col("x1") < col("x2"))
      .select(((col("y2") - col("y1")).cast("double") /
        (col("x2") - col("x1")).cast("double")).as("slope"))
    val ts = pairSlopes
      .agg(sort_array(collect_list(col("slope"))).as("arr"), count(lit(1)).as("n_pairs"))
      .select(col("n_pairs"),
        det.dpercentile(col("arr"), col("n_pairs"), 0.5).as("ts_slope"))
    val ols = series
      .agg(
        count(lit(1)).as("n_points"),
        sum(col(xCol).cast("long")).as("sx"),
        sum(col(yCol).cast("long")).as("sy"),
        sum(col(xCol).cast("long") * col(xCol).cast("long")).as("sxx"),
        sum(col(xCol).cast("long") * col(yCol).cast("long")).as("sxy"))
      .select(col("n_points"),
        ((col("n_points") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n_points") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("ols_slope"))
    ts.crossJoin(ols).select(
      col("n_points"), col("n_pairs"), col("ts_slope"), col("ols_slope"))
  }

  val q153 = Q.of(
    "q153_theil_sen",
    """WITH daily AS (
      |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
      |    COUNT(*) AS y
      |  FROM events GROUP BY 1
      |), pairs AS (
      |  SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b ON a.x < b.x
      |), ts AS (
      |  SELECT COUNT(*) AS n_pairs, list_sort(list(slope)) AS arr FROM pairs
      |), med AS (
      |  SELECT n_pairs,
      |    arr[1 + CAST(floor(0.5 * CAST(n_pairs - 1 AS DOUBLE)) AS INT)]
      |      + (arr[1 + CAST(ceil(0.5 * CAST(n_pairs - 1 AS DOUBLE)) AS INT)]
      |         - arr[1 + CAST(floor(0.5 * CAST(n_pairs - 1 AS DOUBLE)) AS INT)])
      |        * (0.5 * CAST(n_pairs - 1 AS DOUBLE)
      |           - floor(0.5 * CAST(n_pairs - 1 AS DOUBLE))) AS ts_slope
      |  FROM ts
      |), ols AS (
      |  SELECT COUNT(*) AS n_points,
      |    CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS DOUBLE)
      |      / CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS DOUBLE) AS ols_slope
      |  FROM daily
      |)
      |SELECT CAST(n_points AS BIGINT) AS n_points,
      |  CAST(n_pairs AS BIGINT) AS n_pairs,
      |  ts_slope, ols_slope
      |FROM med, ols""".stripMargin) { t =>
    slopes(
      t.events
        .groupBy(datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("x"))
        .agg(count(lit(1)).as("y")),
      "x", "y")
  }

  def all: Seq[Q] = Seq(q153)
}
