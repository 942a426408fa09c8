package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{AsOf, Q, Tables}
import graft.Dims.dimBroadcast
import graft.functions.det._
import graft.operators.TopK

/** q48: the fourth full reference analysis end-to-end — Seasonal
  * Viewing Pattern Analysis (/root/reference/SQL/Seasonal Viewing
  * Pattern Analysis.txt:1-110; pyspark twin) as one oracle-checked
  * composition: asOf-windowed fact scan → time-dimension ladders
  * (season / holiday-period / day-of-week) → per-time-cell engagement
  * metrics → second-level seasonal trends with LAG season-over-season
  * growth → the scalar-subquery seasonal index as a one-row broadcast
  * → opportunity score with a GLOBAL window average → classification
  * ladder + HAVING-style score filter → per-(genre,type) content
  * recommendations via the reference's `NOT IN recent viewing`
  * subquery re-expressed as an anti-join + ranked aggregate.
  *
  * Reference → testdata mapping (SURVEY §3, same as q47):
  * viewing_history→lineitem (start_time→l_shipdate,
  * completion→(1−l_discount)·100, watch minutes→l_quantity,
  * viewer→l_suppkey), content→part (genre→p_brand,
  * content_type→p_type, maturity→p_size class, title→p_name,
  * imdb_rating→(p_retailprice−900)/2). Day-of-week is emitted as
  * Monday=0..Sunday=6 on BOTH engines (Spark `weekday`, DuckDB
  * `isodow−1`) — the raw `dayofweek` functions number days
  * differently (SURVEY §6 rule e).
  *
  * Plan shape at scale: one windowed fact scan into the time-cell
  * aggregate (partial agg below the only fact exchange), the trends
  * frame is cell-sized, the global seasonal-index denominator is a
  * one-row broadcast (never a re-scan), the score's global average is
  * an unpartitioned window over the already-aggregated trends frame
  * (§5 "tiny aggregates" exception), and the recommendation branch is
  * dim-sized (part anti-join recent-shipped part keys → top-3 ranked
  * aggregate per (genre, type)).
  */
object Seasonal {

  val defaultAsOf: AsOf = AsOf("2001-08-01")

  def q48For(asOf: AsOf): Q = {
    val hist = asOf.minusDays(730)
    val recent = asOf.minusDays(30)

    Q.of(
      "q48_seasonal_patterns",
      s"""WITH pd AS (
        |  SELECT p_partkey, p_name, p_brand AS genre, p_type AS content_type,
        |    CASE WHEN p_size <= 17 THEN 'small' WHEN p_size <= 34 THEN 'mid' ELSE 'large' END AS maturity_rating,
        |    (p_retailprice - 900) / 2 AS rating
        |  FROM part
        |), tm AS (
        |  SELECT
        |    year(l_shipdate) AS view_year, month(l_shipdate) AS view_month,
        |    isodow(l_shipdate) - 1 AS day_of_week,
        |    CASE WHEN month(l_shipdate) IN (12, 1, 2) THEN 'Winter'
        |         WHEN month(l_shipdate) IN (3, 4, 5) THEN 'Spring'
        |         WHEN month(l_shipdate) IN (6, 7, 8) THEN 'Summer'
        |         ELSE 'Fall' END AS season,
        |    CASE WHEN month(l_shipdate) = 12 AND day(l_shipdate) BETWEEN 20 AND 31 THEN 'Christmas'
        |         WHEN month(l_shipdate) = 7 AND day(l_shipdate) BETWEEN 1 AND 7 THEN 'Summer Holiday'
        |         WHEN month(l_shipdate) = 3 AND day(l_shipdate) BETWEEN 15 AND 21 THEN 'Spring Break'
        |         ELSE 'Regular' END AS holiday_period,
        |    pd.genre, pd.content_type, pd.maturity_rating,
        |    COUNT(*) AS total_views,
        |    COUNT(DISTINCT l_suppkey) AS unique_viewers,
        |    CAST(SUM(CAST((1.0 - l_discount) * 100 AS DECIMAL(20,6))) AS DOUBLE)
        |      / COUNT(*) AS avg_completion,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS avg_duration,
        |    COUNT(CASE WHEN l_quantity > 40 THEN 1 END) AS long_session_views
        |  FROM lineitem JOIN pd ON l_partkey = pd.p_partkey
        |  WHERE l_shipdate > ${hist.sqlTs} AND l_shipdate <= ${asOf.sqlTs}
        |  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8
        |), gavg AS (
        |  SELECT CAST(SUM(total_views) AS DOUBLE) / COUNT(*) AS global_avg_views FROM tm
        |), tr AS (
        |  SELECT season, holiday_period, day_of_week, genre, content_type, maturity_rating,
        |    CAST(SUM(total_views) AS DOUBLE) / COUNT(*) AS avg_views,
        |    CAST(SUM(unique_viewers) AS DOUBLE) / COUNT(*) AS avg_unique_viewers,
        |    CAST(SUM(CAST(avg_completion AS DECIMAL(20,6))) AS DOUBLE)
        |      / COUNT(avg_completion) AS avg_completion_rate,
        |    CAST(SUM(long_session_views) AS DOUBLE) / COUNT(*) AS avg_long_sessions
        |  FROM tm
        |  GROUP BY 1, 2, 3, 4, 5, 6
        |), trend AS (
        |  SELECT tr.*,
        |    (avg_views - lag(avg_views) OVER w) / lag(avg_views) OVER w * 100 AS view_growth_percent,
        |    avg_views / (SELECT global_avg_views FROM gavg) AS seasonal_index
        |  FROM tr
        |  WINDOW w AS (PARTITION BY genre, content_type, day_of_week
        |               ORDER BY season, holiday_period, maturity_rating)
        |), perf AS (
        |  SELECT trend.*,
        |    CASE WHEN seasonal_index > 1.2 THEN 'High Seasonal'
        |         WHEN seasonal_index > 0.8 THEN 'Moderate Seasonal'
        |         ELSE 'Low Seasonal' END AS seasonal_performance,
        |    CAST(CASE WHEN seasonal_index > 1.5 THEN 1 ELSE 0 END AS DOUBLE) * 0.4
        |      + CAST(CASE WHEN view_growth_percent > 20 THEN 1 ELSE 0 END AS DOUBLE) * 0.3
        |      + CAST(CASE WHEN avg_long_sessions > AVG(avg_long_sessions) OVER () THEN 1 ELSE 0 END AS DOUBLE) * 0.3
        |      AS scheduling_opportunity_score
        |  FROM trend
        |), recent_watched AS (
        |  SELECT DISTINCT l_partkey FROM lineitem
        |  WHERE l_shipdate > ${recent.sqlTs} AND l_shipdate <= ${asOf.sqlTs}
        |), recs AS (
        |  SELECT genre, content_type,
        |    string_agg(p_name, ', ' ORDER BY rating DESC, p_name, p_partkey) AS recommended_content
        |  FROM (
        |    SELECT pd.*, row_number() OVER (PARTITION BY genre, content_type
        |                                    ORDER BY rating DESC, p_name, p_partkey) AS rn
        |    FROM pd
        |    WHERE p_partkey NOT IN (SELECT l_partkey FROM recent_watched)
        |  ) WHERE rn <= 3
        |  GROUP BY genre, content_type
        |)
        |SELECT p.season, p.holiday_period, p.day_of_week, p.genre, p.content_type,
        |  p.maturity_rating, p.seasonal_performance, p.scheduling_opportunity_score,
        |  p.avg_views, p.avg_completion_rate, p.seasonal_index, p.view_growth_percent,
        |  r.recommended_content
        |FROM perf p LEFT JOIN recs r ON p.genre = r.genre AND p.content_type = r.content_type
        |WHERE p.scheduling_opportunity_score >= 0.5
        |ORDER BY p.season, p.scheduling_opportunity_score DESC,
        |  p.holiday_period, p.day_of_week, p.genre, p.content_type, p.maturity_rating""".stripMargin) { t =>
      val pd = t.part.select(col("p_partkey"), col("p_name"),
        col("p_brand").as("genre"), col("p_type").as("content_type"),
        when(col("p_size") <= 17, "small").when(col("p_size") <= 34, "mid")
          .otherwise("large").as("maturity_rating"),
        ((col("p_retailprice") - 900) / 2).as("rating"))
      val tm = t.lineitem
        .filter(col("l_shipdate") > hist.tsLit && col("l_shipdate") <= asOf.tsLit)
        .join(dimBroadcast(pd), col("l_partkey") === col("p_partkey"))
        .groupBy(
          year(col("l_shipdate")).as("view_year"),
          month(col("l_shipdate")).as("view_month"),
          weekday(col("l_shipdate")).as("day_of_week"),
          when(month(col("l_shipdate")).isin(12, 1, 2), "Winter")
            .when(month(col("l_shipdate")).isin(3, 4, 5), "Spring")
            .when(month(col("l_shipdate")).isin(6, 7, 8), "Summer")
            .otherwise("Fall").as("season"),
          when(month(col("l_shipdate")) === 12 && dayofmonth(col("l_shipdate")).between(20, 31), "Christmas")
            .when(month(col("l_shipdate")) === 7 && dayofmonth(col("l_shipdate")).between(1, 7), "Summer Holiday")
            .when(month(col("l_shipdate")) === 3 && dayofmonth(col("l_shipdate")).between(15, 21), "Spring Break")
            .otherwise("Regular").as("holiday_period"),
          col("genre"), col("content_type"), col("maturity_rating"))
        .agg(
          count(lit(1)).as("total_views"),
          countDistinct(col("l_suppkey")).as("unique_viewers"),
          (dsum((lit(1.0) - col("l_discount")) * 100) / count(lit(1))).as("avg_completion"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_duration"),
          count(when(col("l_quantity") > 40, 1)).as("long_session_views"))
      // the reference's scalar subquery: global mean of cell views as a
      // one-row broadcast, never a fact re-scan
      val glob = tm.agg(
        (sum(col("total_views")).cast("double") / count(lit(1))).as("global_avg_views"))
      val tr = tm
        .groupBy(col("season"), col("holiday_period"), col("day_of_week"),
          col("genre"), col("content_type"), col("maturity_rating"))
        .agg(
          (sum(col("total_views")).cast("double") / count(lit(1))).as("avg_views"),
          (sum(col("unique_viewers")).cast("double") / count(lit(1))).as("avg_unique_viewers"),
          (dsum(col("avg_completion")) / count(col("avg_completion"))).as("avg_completion_rate"),
          (sum(col("long_session_views")).cast("double") / count(lit(1))).as("avg_long_sessions"))
      val w = Window.partitionBy(col("genre"), col("content_type"), col("day_of_week"))
        .orderBy(col("season"), col("holiday_period"), col("maturity_rating"))
      val trend = tr
        .withColumn("view_growth_percent",
          (col("avg_views") - lag(col("avg_views"), 1).over(w))
            / lag(col("avg_views"), 1).over(w) * 100)
        .crossJoin(broadcast(glob))
        .withColumn("seasonal_index", col("avg_views") / col("global_avg_views"))
      val globalW = Window.partitionBy() // global window over the cell-sized trends frame
      val perf = trend
        .withColumn("seasonal_performance",
          when(col("seasonal_index") > 1.2, "High Seasonal")
            .when(col("seasonal_index") > 0.8, "Moderate Seasonal")
            .otherwise("Low Seasonal"))
        .withColumn("scheduling_opportunity_score",
          when(col("seasonal_index") > 1.5, 1).otherwise(0).cast("double") * 0.4 +
            when(col("view_growth_percent") > 20, 1).otherwise(0).cast("double") * 0.3 +
            when(col("avg_long_sessions") > avg(col("avg_long_sessions")).over(globalW), 1)
              .otherwise(0).cast("double") * 0.3)
      // NOT IN (recently watched) -> left_anti join on the distinct
      // recently-shipped part keys, then the ranked top-3 aggregate
      val recentWatched = t.lineitem
        .filter(col("l_shipdate") > recent.tsLit && col("l_shipdate") <= asOf.tsLit)
        .select(col("l_partkey")).distinct()
      val unwatched = pd.join(recentWatched,
        col("p_partkey") === col("l_partkey"), "left_anti")
      val recs = TopK.perGroup(unwatched, Seq(col("genre"), col("content_type")),
          Seq(col("rating").desc, col("p_name"), col("p_partkey")), k = 3, rankCol = "graft_rn")
        .groupBy(col("genre"), col("content_type"))
        .agg(expr(
          "array_join(transform(array_sort(collect_list(struct(-rating AS negr, p_name, p_partkey)))," +
            " x -> x.p_name), ', ')").as("recommended_content"))
      perf
        .join(broadcast(recs), Seq("genre", "content_type"), "left")
        .filter(col("scheduling_opportunity_score") >= 0.5)
        .select(col("season"), col("holiday_period"), col("day_of_week"),
          col("genre"), col("content_type"), col("maturity_rating"),
          col("seasonal_performance"), col("scheduling_opportunity_score"),
          col("avg_views"), col("avg_completion_rate"), col("seasonal_index"),
          col("view_growth_percent"), col("recommended_content"))
        .orderBy(col("season"), col("scheduling_opportunity_score").desc,
          col("holiday_period"), col("day_of_week"), col("genre"),
          col("content_type"), col("maturity_rating"))
    }
  }

  val q48: Q = q48For(defaultAsOf)

  def all: Seq[Q] = Seq(q48)
}
