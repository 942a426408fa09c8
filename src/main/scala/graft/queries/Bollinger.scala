package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q168: BOLLINGER BANDS / rolling volatility envelope (Bollinger
  * 1980s, public) — per event type, the 7-day rolling mean ± 2
  * rolling stddevs over the daily count series, with each day's
  * breakout flag: the adaptive anomaly envelope ops dashboards draw
  * where q138 alarms on sustained LEVEL shifts and q151 uses one
  * static fence — the band WIDTH tracks recent volatility, so a
  * noisy series needs a bigger spike to flag.
  *
  * Determinism: the rolling moments are EXACT integer window sums
  * (Σn, Σn² over a ROWS frame of integer counts — no decimal routing
  * needed, no order dependence inside a sum of ≤7 int64 terms? — a
  * window ROWS frame sums in frame order on both engines, and int64
  * addition is associative anyway); mean/stddev are the identical
  * IEEE sample-moment expression both sides (q11), bands round 4;
  * the breakout flag compares the RAW count against the ROUNDED
  * band, so the flag is decided on identical numbers (the q152
  * round-before-gate rule). Head days with fewer than 3 observations
  * emit NULL bands and no flag (a 1-sample stddev is undefined, a
  * 2-sample band is noise).
  *
  * Scale shape: one map-side-combined daily pre-aggregate (bounded
  * by types × days), one window pass per type partition for all four
  * rolling quantities.
  */
object Bollinger {

  private val Win = 7
  private val MinObs = 3

  /** Rolling-band report over (key, ord, integer n) series. Factored
    * so the spec can pin a hand-computed flat-then-spike series, the
    * head NULLs, and the adaptive-width contrast.
    */
  def bands(series: DataFrame, keyCol: String, ordCol: String,
      nCol: String): DataFrame = {
    val roll = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
      .rowsBetween(-(Win - 1), 0)
    val n = col("graft_k").cast("double")
    val sx = col("graft_sx").cast("double")
    val sxx = col("graft_sxx").cast("double")
    val mean = sx / n
    val sd = sqrt((n * sxx - sx * sx) / (n * (n - lit(1.0))))
    series
      .withColumn("graft_k", count(lit(1)).over(roll))
      .withColumn("graft_sx", sum(col(nCol)).over(roll))
      .withColumn("graft_sxx", sum(col(nCol) * col(nCol)).over(roll))
      .withColumn("mid", when(col("graft_k") >= MinObs, round(mean, 4)))
      .withColumn("band_lo", when(col("graft_k") >= MinObs, round(mean - lit(2.0) * sd, 4)))
      .withColumn("band_hi", when(col("graft_k") >= MinObs, round(mean + lit(2.0) * sd, 4)))
      .withColumn("breakout",
        when(col("band_hi").isNull, lit(null).cast("string"))
          .when(col(nCol) > col("band_hi"), lit("above"))
          .when(col(nCol) < col("band_lo"), lit("below"))
          .otherwise(lit("inside")))
      .select(col(keyCol), col(ordCol), col(nCol), col("graft_k").as("n_window"),
        col("mid"), col("band_lo"), col("band_hi"), col("breakout"))
  }

  val q168 = Q.of(
    "q168_bollinger_bands",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2
      |), rolled AS (
      |  SELECT event_type, day, n,
      |    COUNT(*) OVER w AS k,
      |    SUM(n) OVER w AS sx,
      |    SUM(n * n) OVER w AS sxx
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |), banded AS (
      |  SELECT event_type, day, n, k,
      |    CASE WHEN k >= 3 THEN
      |      round(CAST(sx AS DOUBLE) / CAST(k AS DOUBLE), 4) END AS mid,
      |    CASE WHEN k >= 3 THEN
      |      round(CAST(sx AS DOUBLE) / CAST(k AS DOUBLE)
      |        - 2.0 * sqrt((CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |          / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0))), 4) END AS band_lo,
      |    CASE WHEN k >= 3 THEN
      |      round(CAST(sx AS DOUBLE) / CAST(k AS DOUBLE)
      |        + 2.0 * sqrt((CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |          / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0))), 4) END AS band_hi
      |  FROM rolled
      |)
      |SELECT event_type, day,
      |  CAST(n AS BIGINT) AS n,
      |  CAST(k AS BIGINT) AS n_window,
      |  mid, band_lo, band_hi,
      |  CASE WHEN band_hi IS NULL THEN NULL
      |    WHEN n > band_hi THEN 'above'
      |    WHEN n < band_lo THEN 'below'
      |    ELSE 'inside' END AS breakout
      |FROM banded
      |ORDER BY event_type, day""".stripMargin) { t =>
    bands(
      t.events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")),
      "event_type", "day", "n")
      .orderBy(col("event_type"), col("day"))
  }

  def all: Seq[Q] = Seq(q168)
}
