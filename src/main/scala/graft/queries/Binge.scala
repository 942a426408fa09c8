package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{AsOf, Q, Tables}
import graft.Dims.dimBroadcast
import graft.functions.det._

/** q49: the fifth full reference analysis end-to-end — Binge-Watching
  * Behavior Analysis (/root/reference/SQL/Binge-Watching Behavior
  * Analysis.txt:1-140; pyspark twin) as one oracle-checked
  * composition: asOf-windowed fact → LAG gap detection per
  * (viewer, series) with a deterministic total order → binge episodes
  * (gap filter + HAVING ≥ 3) → intensity ladder → per-viewer binge
  * behavior (weekend/holiday ratios, heavy-binger classification) →
  * per-series binge analytics with the reference's two correlated
  * subqueries re-expressed as broadcast-joined aggregates (series
  * total minutes; first-view completion per viewer) → bingeability
  * score with a global window max normalizer → marketing ladder.
  *
  * Reference → testdata mapping (SURVEY §3): profile→l_suppkey,
  * content/series→p_brand (the (viewer, series) cell density is
  * ~24 shipments at EVERY scale factor — lineitem, suppliers and
  * brands co-scale — so binge runs exist at sf0.001 and sf100 alike),
  * start_time→l_shipdate (gaps in DAYS, thresholds rescaled from the
  * reference's minutes), duration→l_quantity,
  * completion→(1−l_discount)·100, country→nation via supplier.
  *
  * Plan shape at scale: ONE windowed fact scan feeds the session
  * window (partitioned by (suppkey, brand) — one exchange), and a
  * single fused (viewer, series) aggregate reusing that partitioning
  * computes the binge metrics, the unfiltered series-minute partials,
  * and the first-view completion in the same pass (conditional
  * aggregates; decimal partials kept exact for re-aggregation). The
  * resulting cell frame (≤|suppliers|·|brands| rows) is cached, so
  * the reference's correlated `SUM(duration) per content` and
  * `first-view completion` subqueries become one slim series-level
  * aggregate over the cache — the fact is scanned and shuffled
  * exactly once. The score's normalizer is a window max over the
  * ≤|brands| output frame.
  */
object Binge {

  val defaultAsOf: AsOf = AsOf("2001-08-01")

  def q49For(asOf: AsOf, lookbackDays: Int): Q = {
    val hist = asOf.minusDays(lookbackDays)

    Q.of(
      "q49_binge_behavior",
      s"""WITH vs AS (
        |  SELECT l_suppkey AS viewer, p_brand AS series, l_shipdate AS ts,
        |    l_quantity AS minutes, (1.0 - l_discount) * 100 AS completion,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(lag(l_shipdate) OVER w AS DATE) AS BIGINT) AS gap_days,
        |    row_number() OVER w AS view_seq
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate > ${hist.sqlTs} AND l_shipdate <= ${asOf.sqlTs}
        |  WINDOW w AS (PARTITION BY l_suppkey, p_brand
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |), be AS (
        |  SELECT viewer, series, MIN(ts) AS binge_start,
        |    COUNT(*) AS episodes,
        |    CAST(SUM(CAST(minutes AS DECIMAL(20,6))) AS DOUBLE) AS total_minutes,
        |    CAST(SUM(gap_days) AS DOUBLE) / COUNT(gap_days) AS avg_gap_days
        |  FROM vs
        |  WHERE gap_days IS NULL OR gap_days < 30
        |  GROUP BY viewer, series
        |  HAVING COUNT(*) >= 3
        |), ubb AS (
        |  SELECT be.viewer,
        |    COUNT(DISTINCT be.series) AS total_binge_series,
        |    CAST(SUM(CASE WHEN isodow(binge_start) - 1 IN (5, 6) THEN 1 ELSE 0 END) AS DOUBLE)
        |      / COUNT(*) AS weekend_binge_ratio,
        |    CAST(SUM(CASE WHEN month(binge_start) IN (11, 12) THEN 1 ELSE 0 END) AS DOUBLE)
        |      / COUNT(*) AS holiday_binge_ratio
        |  FROM be
        |  GROUP BY be.viewer
        |), ser AS (
        |  SELECT series, CAST(SUM(CAST(minutes AS DECIMAL(20,6))) AS DOUBLE) AS series_total_minutes
        |  FROM vs GROUP BY series
        |), fe AS (
        |  SELECT series,
        |    CAST(SUM(CAST(completion AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS first_episode_completion_rate
        |  FROM vs WHERE view_seq = 1 GROUP BY series
        |), bca AS (
        |  SELECT be.series,
        |    COUNT(DISTINCT be.viewer) AS total_binge_viewers,
        |    CAST(SUM(episodes) AS DOUBLE) / COUNT(*) AS avg_binge_length,
        |    CAST(SUM(CAST(total_minutes AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS avg_binge_duration,
        |    CAST(SUM(CASE WHEN avg_gap_days < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_intensity,
        |    CAST(SUM(CAST(total_minutes * 100.0 / ser.series_total_minutes AS DECIMAL(20,6))) AS DOUBLE)
        |      / COUNT(*) AS binge_completion_percentage
        |  FROM be JOIN ser ON be.series = ser.series
        |  GROUP BY be.series
        |  HAVING COUNT(DISTINCT be.viewer) >= 2
        |), heavy AS (
        |  SELECT be.series, COUNT(DISTINCT be.viewer) AS heavy_binger_viewers
        |  FROM be JOIN ubb ON be.viewer = ubb.viewer
        |  WHERE ubb.total_binge_series >= 20
        |  GROUP BY be.series
        |), scored AS (
        |  SELECT bca.series, bca.total_binge_viewers, bca.avg_binge_length,
        |    bca.avg_binge_duration, bca.n_high_intensity,
        |    bca.binge_completion_percentage, fe.first_episode_completion_rate,
        |    CAST(bca.total_binge_viewers AS DOUBLE)
        |        / MAX(bca.total_binge_viewers) OVER () * 10 * 0.3
        |      + LEAST(bca.avg_binge_length, 10) * 0.25
        |      + bca.binge_completion_percentage / 10 * 0.25
        |      + fe.first_episode_completion_rate / 10 * 0.2 AS bingeability_score,
        |    COALESCE(h.heavy_binger_viewers, 0) AS heavy_binger_viewers
        |  FROM bca
        |  JOIN fe ON bca.series = fe.series
        |  LEFT JOIN heavy h ON bca.series = h.series
        |)
        |SELECT *,
        |  CASE WHEN bingeability_score > 7 THEN 'Promote as Binge-Worthy'
        |       WHEN first_episode_completion_rate > 95 THEN 'Strong First Episode - Push Series'
        |       WHEN binge_completion_percentage > 5 THEN 'High Completion - Feature in Collections'
        |       ELSE 'Standard Promotion' END AS marketing_recommendation
        |FROM scored
        |ORDER BY bingeability_score DESC, series""".stripMargin) { t =>
      val w = Window.partitionBy(col("viewer"), col("series"))
        .orderBy(col("ts"), col("l_orderkey"), col("l_linenumber"))
      val vs = t.lineitem
        .filter(col("l_shipdate") > hist.tsLit && col("l_shipdate") <= asOf.tsLit)
        .join(dimBroadcast(t.part.select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_suppkey").as("viewer"), col("p_brand").as("series"),
          col("l_shipdate").as("ts"), col("l_quantity").as("minutes"),
          ((lit(1.0) - col("l_discount")) * 100).as("completion"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("gap_days",
          datediff(col("ts"), lag(col("ts"), 1).over(w)).cast("long"))
        .withColumn("view_seq", row_number().over(w))
      // One fused pass over the windowed fact: the binge metrics are
      // conditional on the gap filter, the series totals and first-view
      // completion are not — all share the window's (viewer, series)
      // partitioning, so the fact is shuffled exactly once. Decimal
      // partials (not doubles) are kept where a series-level
      // re-aggregation must stay cross-engine exact.
      val inBinge = col("gap_days").isNull || col("gap_days") < 30
      val cells = graft.CacheScope.trackedCache(vs
        .groupBy(col("viewer"), col("series"))
        .agg(
          min(when(inBinge, col("ts"))).as("binge_start"),
          count(when(inBinge, lit(1))).as("episodes"),
          dsum(when(inBinge, col("minutes"))).as("total_minutes"),
          (sum(when(inBinge, col("gap_days"))).cast("double")
            / count(when(inBinge, col("gap_days")))).as("avg_gap_days"),
          sum(col("minutes").cast(D20_6)).as("all_minutes_dec"),
          max(when(col("view_seq") === 1, col("completion"))).as("first_completion")))
      val be = cells.filter(col("episodes") >= 3)
        .select(col("viewer"), col("series"), col("binge_start"),
          col("episodes"), col("total_minutes"), col("avg_gap_days"))
      val ubb = be.groupBy(col("viewer"))
        .agg(
          countDistinct(col("series")).as("total_binge_series"),
          (sum(when(weekday(col("binge_start")).isin(5, 6), 1).otherwise(0)).cast("double")
            / count(lit(1))).as("weekend_binge_ratio"),
          (sum(when(month(col("binge_start")).isin(11, 12), 1).otherwise(0)).cast("double")
            / count(lit(1))).as("holiday_binge_ratio"))
      // ser + fe in one series-level aggregate over the cached cells:
      // summing the per-cell decimal partials is exactly the oracle's
      // flat decimal sum (decimal addition is associative), and every
      // cell carries exactly one view_seq=1 completion.
      val serfe = cells.groupBy(col("series")).agg(
        sum(col("all_minutes_dec")).cast("double").as("series_total_minutes"),
        (sum(col("first_completion").cast(D20_6)).cast("double") / count(lit(1)))
          .as("first_episode_completion_rate"))
      val ser = serfe.select(col("series"), col("series_total_minutes"))
      val fe  = serfe.select(col("series"), col("first_episode_completion_rate"))
      val bca = be.join(broadcast(ser), "series")
        .groupBy(col("series"))
        .agg(
          countDistinct(col("viewer")).as("total_binge_viewers"),
          (sum(col("episodes")).cast("double") / count(lit(1))).as("avg_binge_length"),
          (dsum(col("total_minutes")) / count(lit(1))).as("avg_binge_duration"),
          sum(when(col("avg_gap_days") < 10, 1).otherwise(0)).as("n_high_intensity"),
          (dsum(col("total_minutes") * 100.0 / col("series_total_minutes")) / count(lit(1)))
            .as("binge_completion_percentage"))
        .filter(col("total_binge_viewers") >= 2)
      val heavy = be
        .join(broadcast(ubb.filter(col("total_binge_series") >= 20).select(col("viewer"))), "viewer")
        .groupBy(col("series"))
        .agg(countDistinct(col("viewer")).as("heavy_binger_viewers"))
      val globalW = Window.partitionBy() // ≤|brands| rows at this point
      val scored = bca
        .join(broadcast(fe), "series")
        .join(broadcast(heavy), Seq("series"), "left")
        .select(col("series"), col("total_binge_viewers"), col("avg_binge_length"),
          col("avg_binge_duration"), col("n_high_intensity"),
          col("binge_completion_percentage"), col("first_episode_completion_rate"),
          (col("total_binge_viewers").cast("double")
            / max(col("total_binge_viewers")).over(globalW) * 10 * 0.3
            + least(col("avg_binge_length"), lit(10)) * 0.25
            + col("binge_completion_percentage") / 10 * 0.25
            + col("first_episode_completion_rate") / 10 * 0.2).as("bingeability_score"),
          coalesce(col("heavy_binger_viewers"), lit(0L)).as("heavy_binger_viewers"))
      scored
        .withColumn("marketing_recommendation",
          when(col("bingeability_score") > 7, "Promote as Binge-Worthy")
            .when(col("first_episode_completion_rate") > 95, "Strong First Episode - Push Series")
            .when(col("binge_completion_percentage") > 5, "High Completion - Feature in Collections")
            .otherwise("Standard Promotion"))
        .orderBy(col("bingeability_score").desc, col("series"))
    }
  }

  val q49: Q = q49For(defaultAsOf, lookbackDays = 730)

  def all: Seq[Q] = Seq(q49)
}
