package graft.queries

import org.apache.spark.sql.functions._
import graft.{AsOf, Q}
import graft.functions.det._

/** q64: the thirteenth full reference analysis end-to-end — Advanced
  * Recommendation System Performance (/root/reference/SQL/Advanced
  * Recommendation System Performance.txt:1-96; pyspark twin) as one
  * oracle-checked composition: per-recommendation outcome tracking
  * (was it watched within 30 days, hours-to-watch, completion,
  * 90-day user activity, genre-match count — the reference's FIVE
  * correlated subqueries) → per-algorithm metrics (acceptance rate,
  * time-to-watch, completion, score↔acceptance correlation) →
  * activity-segment acceptance pivoted wide.
  *
  * Reference → testdata mapping (SURVEY §3): the recommendations
  * table→'click' events (algorithm_version→event_id mod 3,
  * recommendation_score→value, content→props.k,
  * created_date→ts), viewing_history→'view' events of the same
  * events table (completion→value), genre→content key mod 5.
  *
  * Re-designs vs the reference (documented deviations): all five
  * correlated subqueries fuse into ONE co-partitioned LEFT join
  * recs⋈views on user_id followed by a per-recommendation
  * conditional aggregate — each subquery is a pair predicate
  * (same-content + follow-window → watched/hours/completion;
  * 90-day-lookback → activity; genre-equal lookback → genre match).
  * The reference's open-ended `>= created − 90 DAY` activity windows
  * gain a `<= created` ceiling (history, not future). Activity
  * segment bands re-calibrated to <4 / <9 (terciles of the measured
  * distribution; the reference's 10/50 would put everything in one
  * band). The correlation re-aggregates EXACTLY across the
  * (algorithm, segment) grid: decimal moment sums (n, Σx, Σx², Σy,
  * Σy², Σxy) are kept as decimals through both aggregation levels
  * and the q11 Pearson expression is evaluated once at algorithm
  * level — so segment metrics and algorithm metrics come from one
  * pass with no second scan and no cache. Watched-only completion
  * averages flatten the segment-level sorted arrays and left-fold at
  * algorithm level (q58's exactness rule).
  *
  * Plan shape at scale: TWO pruned scans of events (event_type
  * pushed: the rec branch and the view branch) → one user_id
  * exchange each into the co-partitioned LEFT join → the
  * per-recommendation aggregate reuses the join's user_id clustering
  * (groupBy(user_id, rec_id, …) — no further fact exchange) → the
  * 9-cell (algorithm, segment) aggregate → the 3-row algorithm
  * frame. Pairs per user are |recs/user|·|views/user| — the
  * canonical recommendations×history join shape.
  */
object Reco {

  val defaultAsOf: AsOf = AsOf("2024-01-31")
  val defaultLookbackDays = 180

  def q64For(asOf: AsOf, lookbackDays: Int): Q = {
    val start = asOf.minusDays(lookbackDays)

    Q.of(
      "q64_recommendation_perf",
      s"""WITH recs AS (
        |  SELECT event_id AS rec_id, user_id,
        |    'algo_v' || CAST(event_id % 3 + 1 AS VARCHAR) AS algorithm_version,
        |    CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS content_id,
        |    value AS recommendation_score, ts AS rec_ts
        |  FROM events WHERE event_type = 'click'
        |    AND ts > ${start.sqlTs} AND ts <= ${asOf.sqlTs}
        |), views AS (
        |  SELECT user_id, ts AS v_ts,
        |    CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS v_content,
        |    value AS v_completion
        |  FROM events WHERE event_type = 'view' AND ts <= ${asOf.sqlTs}
        |), rp AS (
        |  SELECT r.user_id, r.rec_id, r.algorithm_version, r.recommendation_score,
        |    max(CASE WHEN v.v_content = r.content_id
        |          AND v.v_ts >= r.rec_ts AND v.v_ts <= r.rec_ts + INTERVAL 30 DAY
        |        THEN 1 ELSE 0 END) AS was_watched,
        |    min(CASE WHEN v.v_content = r.content_id AND v.v_ts >= r.rec_ts
        |        THEN v.v_ts END) AS min_watch_ts,
        |    CAST(SUM(CASE WHEN v.v_content = r.content_id AND v.v_ts >= r.rec_ts
        |        THEN CAST(v.v_completion AS DECIMAL(20,6)) END) AS DOUBLE)
        |      / count(CASE WHEN v.v_content = r.content_id AND v.v_ts >= r.rec_ts
        |        THEN 1 END) AS completion_if_watched,
        |    count(CASE WHEN v.v_ts > r.rec_ts - INTERVAL 90 DAY AND v.v_ts <= r.rec_ts
        |        THEN 1 END) AS user_activity_level,
        |    count(CASE WHEN v.v_content % 5 = r.content_id % 5
        |          AND v.v_ts > r.rec_ts - INTERVAL 90 DAY AND v.v_ts <= r.rec_ts
        |        THEN 1 END) AS genre_match_count,
        |    max(r.rec_ts) AS rec_ts
        |  FROM recs r LEFT JOIN views v ON v.user_id = r.user_id
        |  GROUP BY 1, 2, 3, 4
        |), seg AS (
        |  SELECT *,
        |    CASE WHEN user_activity_level < 4 THEN 'Low Activity'
        |         WHEN user_activity_level < 9 THEN 'Medium Activity'
        |         ELSE 'High Activity' END AS user_segment,
        |    CASE WHEN was_watched = 1 THEN
        |      (epoch_us(min_watch_ts) - epoch_us(rec_ts)) // 3600000000 END AS hours_to_watch
        |  FROM rp
        |), usa AS (
        |  SELECT algorithm_version, user_segment,
        |    count(*) AS n,
        |    CAST(SUM(was_watched) AS BIGINT) AS n_watched,
        |    CAST(SUM(CASE WHEN was_watched = 1 THEN hours_to_watch END) AS BIGINT) AS hours_sum,
        |    list_sort(list(completion_if_watched) FILTER (was_watched = 1)) AS comp_arr,
        |    SUM(CAST(recommendation_score AS DECIMAL(28,6))) AS sx,
        |    SUM(CAST(recommendation_score * recommendation_score AS DECIMAL(28,6))) AS sxx,
        |    SUM(CAST(was_watched AS DECIMAL(28,6))) AS sy,
        |    SUM(CAST(was_watched * was_watched AS DECIMAL(28,6))) AS syy,
        |    SUM(CAST(recommendation_score * was_watched AS DECIMAL(28,6))) AS sxy
        |  FROM seg GROUP BY 1, 2
        |)
        |SELECT algorithm_version,
        |  CAST(SUM(n) AS BIGINT) AS total_recommendations,
        |  CAST(SUM(n_watched) AS BIGINT) AS accepted_recommendations,
        |  CAST(SUM(n_watched) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) * 100 AS acceptance_rate,
        |  CAST(SUM(hours_sum) AS DOUBLE) / CAST(SUM(n_watched) AS DOUBLE) AS avg_time_to_watch,
        |  list_reduce(list_sort(flatten(list(comp_arr))), (a, b) -> a + b)
        |    / CAST(SUM(n_watched) AS DOUBLE) AS avg_completion_rate,
        |  (CAST(SUM(n) AS DOUBLE) * CAST(SUM(sxy) AS DOUBLE)
        |     - CAST(SUM(sx) AS DOUBLE) * CAST(SUM(sy) AS DOUBLE))
        |    / (sqrt(CAST(SUM(n) AS DOUBLE) * CAST(SUM(sxx) AS DOUBLE)
        |         - CAST(SUM(sx) AS DOUBLE) * CAST(SUM(sx) AS DOUBLE))
        |       * sqrt(CAST(SUM(n) AS DOUBLE) * CAST(SUM(syy) AS DOUBLE)
        |           - CAST(SUM(sy) AS DOUBLE) * CAST(SUM(sy) AS DOUBLE))) AS score_correlation,
        |  max(CASE WHEN user_segment = 'Low Activity'
        |      THEN CAST(n_watched AS DOUBLE) / CAST(n AS DOUBLE) * 100 END) AS low_activity_acceptance,
        |  max(CASE WHEN user_segment = 'Medium Activity'
        |      THEN CAST(n_watched AS DOUBLE) / CAST(n AS DOUBLE) * 100 END) AS medium_activity_acceptance,
        |  max(CASE WHEN user_segment = 'High Activity'
        |      THEN CAST(n_watched AS DOUBLE) / CAST(n AS DOUBLE) * 100 END) AS high_activity_acceptance
        |FROM usa GROUP BY 1
        |ORDER BY acceptance_rate DESC, algorithm_version""".stripMargin) { t =>
      val contentOf = regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")

      val recs = t.events
        .filter(col("event_type") === "click" &&
          col("ts") > start.tsLit && col("ts") <= asOf.tsLit)
        .select(col("event_id").as("rec_id"), col("user_id"),
          concat(lit("algo_v"), (col("event_id") % 3 + 1).cast("string"))
            .as("algorithm_version"),
          contentOf.as("content_id"), col("value").as("recommendation_score"),
          col("ts").as("rec_ts"))

      val views = t.events
        .filter(col("event_type") === "view" && col("ts") <= asOf.tsLit)
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
          contentOf.as("v_content"), col("value").as("v_completion"))

      val sameContent = col("v_content") === col("content_id")
      val afterRec = col("v_ts") >= col("rec_ts")
      val in30d = afterRec && col("v_ts") <= col("rec_ts") + expr("INTERVAL 30 DAY")
      val lookback = col("v_ts") > col("rec_ts") - expr("INTERVAL 90 DAY") &&
        col("v_ts") <= col("rec_ts")

      val rp = recs.join(views, col("v_user") === col("user_id"), "left")
        .groupBy(col("user_id"), col("rec_id"), col("algorithm_version"),
          col("recommendation_score"))
        .agg(
          max(when(sameContent && in30d, 1).otherwise(0)).as("was_watched"),
          min(when(sameContent && afterRec, col("v_ts"))).as("min_watch_ts"),
          (sum(when(sameContent && afterRec, col("v_completion").cast(D20_6)))
            .cast("double") /
            count(when(sameContent && afterRec, lit(1))))
            .as("completion_if_watched"),
          count(when(lookback, lit(1))).as("user_activity_level"),
          count(when(col("v_content") % 5 === col("content_id") % 5 && lookback, lit(1)))
            .as("genre_match_count"),
          max(col("rec_ts")).as("rec_ts"))

      val seg = rp
        .withColumn("user_segment",
          when(col("user_activity_level") < 4, "Low Activity")
            .when(col("user_activity_level") < 9, "Medium Activity")
            .otherwise("High Activity"))
        .withColumn("hours_to_watch",
          when(col("was_watched") === 1,
            expr("(unix_micros(cast(min_watch_ts as timestamp)) " +
              "- unix_micros(cast(rec_ts as timestamp))) div 3600000000")))

      val usa = seg.groupBy(col("algorithm_version"), col("user_segment"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("was_watched")).cast("long").as("n_watched"),
          sum(when(col("was_watched") === 1, col("hours_to_watch"))).cast("long")
            .as("hours_sum"),
          sort_array(collect_list(when(col("was_watched") === 1,
            col("completion_if_watched")))).as("comp_arr"),
          sum(col("recommendation_score").cast(D28_6)).as("sx"),
          sum((col("recommendation_score") * col("recommendation_score")).cast(D28_6))
            .as("sxx"),
          sum(col("was_watched").cast(D28_6)).as("sy"),
          sum((col("was_watched") * col("was_watched")).cast(D28_6)).as("syy"),
          sum((col("recommendation_score") * col("was_watched")).cast(D28_6)).as("sxy"))

      val segRate = col("n_watched").cast("double") / col("n").cast("double") * 100
      val nD = sum(col("n")).cast("double")
      val sxD = sum(col("sx")).cast("double");  val sxxD = sum(col("sxx")).cast("double")
      val syD = sum(col("sy")).cast("double");  val syyD = sum(col("syy")).cast("double")
      val sxyD = sum(col("sxy")).cast("double")

      usa.groupBy(col("algorithm_version"))
        .agg(
          sum(col("n")).cast("long").as("total_recommendations"),
          sum(col("n_watched")).cast("long").as("accepted_recommendations"),
          (sum(col("n_watched")).cast("double") / sum(col("n")).cast("double") * 100)
            .as("acceptance_rate"),
          (sum(col("hours_sum")).cast("double") / sum(col("n_watched")).cast("double"))
            .as("avg_time_to_watch"),
          (aggregate(array_sort(flatten(collect_list(col("comp_arr")))),
            lit(0.0), (a, x) => a + x) / sum(col("n_watched")).cast("double"))
            .as("avg_completion_rate"),
          ((nD * sxyD - sxD * syD) /
            (sqrt(nD * sxxD - sxD * sxD) * sqrt(nD * syyD - syD * syD)))
            .as("score_correlation"),
          max(when(col("user_segment") === "Low Activity", segRate))
            .as("low_activity_acceptance"),
          max(when(col("user_segment") === "Medium Activity", segRate))
            .as("medium_activity_acceptance"),
          max(when(col("user_segment") === "High Activity", segRate))
            .as("high_activity_acceptance"))
        .orderBy(col("acceptance_rate").desc, col("algorithm_version"))
    }
  }

  val q64: Q = q64For(defaultAsOf, defaultLookbackDays)

  def all: Seq[Q] = Seq(q64)
}
