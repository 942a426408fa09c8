package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{AsOf, Q}
import graft.Dims.dimBroadcast
import graft.functions.det._

/** q56: the seventh full reference analysis end-to-end — User
  * Lifetime Value Prediction (/root/reference/SQL/User Lifetime Value
  * Prediction.txt:1-120; pyspark twin at .py:1-71) as one
  * oracle-checked composition: tenured-user filter (signup ≤
  * asOf−tenure, asOf-parameterized) → per-user engagement metrics
  * over the full event history (the reference's two correlated
  * subqueries — active periods and recent activity — fold into the
  * same grouped pass) → literal subscription rate-card VALUES
  * relation → churn-probability and engagement scores → predicted
  * remaining lifetime ladder → historical/future/total LTV → LTV
  * segmentation + retention-priority ladder, per-user output ordered
  * by predicted value.
  *
  * Reference → testdata mapping (SURVEY §3, consistent with q46/q55):
  * users→customer on user_id=c_custkey, signup_date→first 'signup'
  * event, viewing_history→'view' events (completion→value,
  * content_id→props.k), watchlist→'click' events, ratings→'purchase'
  * events, devices→distinct event types, content.genre→part.p_brand
  * via content_id=p_partkey (the reference's content LEFT JOIN),
  * subscription_type→c_mktsegment with a five-tier rate card,
  * country→nation name. The one-month event span rescales the
  * reference's 90-day tenure / 30-day recency to 21/3 days and
  * "active months" to active view DAYS; score/LTV cutpoints are tuned
  * to the synthetic ranges so every segment branch and (at the gate
  * SFs) every priority branch is populated — at sf0.001 the 15-user
  * population cannot reach the 'Monitor' band, which is empty there
  * by arithmetic, not by accident.
  *
  * Plan shape at scale: ONE events scan (type+ts filters pushed) →
  * broadcast part join for genre → q46's cascade: the signup window
  * min shares the single user_id exchange with the per-user
  * aggregate; all distinct counts are `size(collect_set)` (single
  * phase, no Expand — bounded by per-user event counts, which do not
  * grow with corpus scale). The per-user frame then joins customer
  * with nation broadcast and the five-row rate card broadcast; the
  * fact never shuffles for any dim. Output is |users| rows under a
  * global sort.
  */
object Ltv {

  val defaultAsOf: AsOf = AsOf("2024-01-28")
  val defaultTenureDays = 21
  private val RecentWinDays = 3

  def q56For(asOf: AsOf, tenureDays: Int): Q = {
    val tenured = asOf.minusDays(tenureDays)
    val recent = asOf.minusDays(RecentWinDays)

    Q.of(
      "q56_user_ltv",
      s"""WITH base AS (
        |  SELECT user_id, ts, event_type, value,
        |    CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS content_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END) OVER (PARTITION BY user_id) AS t_signup
        |  FROM events
        |  WHERE ts <= ${asOf.sqlTs}
        |    AND event_type IN ('signup','view','click','purchase')
        |), g AS (
        |  SELECT b.*, p.p_brand AS genre
        |  FROM base b LEFT JOIN part p ON p.p_partkey = b.content_id
        |), uh AS (
        |  SELECT user_id, MIN(t_signup) AS signup_ts,
        |    COUNT(DISTINCT CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END) AS active_days,
        |    COUNT(DISTINCT CASE WHEN event_type = 'view' THEN content_id END) AS total_content_watched,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(20,6)) END) AS DOUBLE)
        |      / COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS avg_completion_rate,
        |    COUNT(DISTINCT event_type) AS devices_used,
        |    COUNT(DISTINCT CASE WHEN event_type = 'view' THEN genre END) AS genres_watched,
        |    COUNT(CASE WHEN event_type = 'view' AND ts >= ${recent.sqlTs} THEN 1 END) AS recent_views,
        |    COUNT(DISTINCT CASE WHEN event_type = 'click' THEN content_id END) AS watchlist_items,
        |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS ratings_given
        |  FROM g GROUP BY user_id
        |  HAVING MIN(t_signup) <= ${tenured.sqlTs}
        |), sv AS (
        |  SELECT * FROM (VALUES
        |    ('AUTOMOBILE', CAST(9.99 AS DOUBLE)), ('BUILDING', CAST(12.99 AS DOUBLE)),
        |    ('FURNITURE', CAST(15.99 AS DOUBLE)), ('MACHINERY', CAST(17.99 AS DOUBLE)),
        |    ('HOUSEHOLD', CAST(19.99 AS DOUBLE))) AS t(subscription_type, monthly_value)
        |), ltv AS (
        |  SELECT uh.user_id, cu.c_mktsegment AS subscription_type, n.n_name AS country,
        |    uh.active_days, sv.monthly_value,
        |    CAST(CASE WHEN uh.recent_views = 0 THEN 0.6 ELSE 0 END AS DOUBLE) +
        |      CAST(CASE WHEN uh.avg_completion_rate < 40 THEN 0.3 ELSE 0 END AS DOUBLE) +
        |      CAST(CASE WHEN uh.genres_watched < 3 THEN 0.1 ELSE 0 END AS DOUBLE) AS churn_probability,
        |    CAST(uh.total_content_watched AS DOUBLE) * 0.2 +
        |      uh.avg_completion_rate * 0.3 +
        |      CAST(uh.devices_used AS DOUBLE) * 0.1 +
        |      CAST(uh.genres_watched AS DOUBLE) * 0.1 +
        |      CAST(uh.watchlist_items AS DOUBLE) * 0.1 +
        |      CAST(uh.ratings_given AS DOUBLE) * 0.1 +
        |      CAST(uh.recent_views AS DOUBLE) / GREATEST(CAST(1 AS DOUBLE), CAST(uh.active_days AS DOUBLE)) * 0.1
        |      AS engagement_score
        |  FROM uh
        |  JOIN customer cu ON cu.c_custkey = uh.user_id
        |  JOIN nation n ON n.n_nationkey = cu.c_nationkey
        |  JOIN sv ON sv.subscription_type = cu.c_mktsegment
        |), pred AS (
        |  SELECT *,
        |    CAST(CASE WHEN engagement_score > 20 THEN 24
        |              WHEN engagement_score > 16 THEN 12
        |              WHEN engagement_score > 12 THEN 6
        |              ELSE 3 END AS DOUBLE) * (1 - churn_probability) AS predicted_remaining_months,
        |    CAST(active_days AS DOUBLE) * monthly_value AS historical_revenue
        |  FROM ltv
        |)
        |SELECT user_id, subscription_type, country, engagement_score, churn_probability,
        |  historical_revenue,
        |  predicted_remaining_months * monthly_value AS predicted_future_ltv,
        |  historical_revenue + predicted_remaining_months * monthly_value AS total_predicted_ltv,
        |  CASE WHEN historical_revenue + predicted_remaining_months * monthly_value > 500 THEN 'VIP'
        |       WHEN historical_revenue + predicted_remaining_months * monthly_value > 350 THEN 'High Value'
        |       WHEN historical_revenue + predicted_remaining_months * monthly_value > 200 THEN 'Medium Value'
        |       ELSE 'Low Value' END AS ltv_segment,
        |  CASE WHEN churn_probability > 0.5 AND historical_revenue + predicted_remaining_months * monthly_value > 250 THEN 'High Priority Retention'
        |       WHEN churn_probability > 0.5 AND historical_revenue + predicted_remaining_months * monthly_value > 150 THEN 'Medium Priority Retention'
        |       WHEN churn_probability > 0.3 THEN 'Monitor'
        |       ELSE 'Healthy' END AS retention_priority
        |FROM pred
        |ORDER BY total_predicted_ltv DESC, user_id""".stripMargin) { t =>
      import t.spark.implicits._

      val w = Window.partitionBy(col("user_id"))
      val base = t.events
        .filter(col("ts") <= asOf.tsLit &&
          col("event_type").isin("signup", "view", "click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_type"), col("value"),
          regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("content_id"))
        .withColumn("t_signup",
          min(when(col("event_type") === "signup", col("ts"))).over(w))
        .join(dimBroadcast(t.part.select(col("p_partkey"), col("p_brand").as("genre"))),
          col("p_partkey") === col("content_id"), "left")

      val isView = col("event_type") === "view"
      val uh = base.groupBy(col("user_id"))
        .agg(
          min(col("t_signup")).as("signup_ts"),
          size(collect_set(when(isView, col("ts").cast("date")))).cast("long")
            .as("active_days"),
          size(collect_set(when(isView, col("content_id")))).cast("long")
            .as("total_content_watched"),
          (dsum(when(isView, col("value"))) / count(when(isView, lit(1))))
            .as("avg_completion_rate"),
          size(collect_set(col("event_type"))).cast("long").as("devices_used"),
          size(collect_set(when(isView, col("genre")))).cast("long").as("genres_watched"),
          count(when(isView && col("ts") >= recent.tsLit, lit(1))).as("recent_views"),
          size(collect_set(when(col("event_type") === "click", col("content_id"))))
            .cast("long").as("watchlist_items"),
          count(when(col("event_type") === "purchase", lit(1))).as("ratings_given"))
        .filter(col("signup_ts") <= tenured.tsLit)

      val sv = Seq(
        ("AUTOMOBILE", 9.99), ("BUILDING", 12.99), ("FURNITURE", 15.99),
        ("MACHINERY", 17.99), ("HOUSEHOLD", 19.99))
        .toDF("subscription_type", "monthly_value")
      val cust = t.customer
        .join(dimBroadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_mktsegment").as("subscription_type"),
          col("n_name").as("country"))

      val ltv = uh
        .join(cust, col("c_custkey") === col("user_id"))
        .join(broadcast(sv), "subscription_type")
        .withColumn("churn_probability",
          when(col("recent_views") === 0, 0.6).otherwise(0.0) +
            when(col("avg_completion_rate") < 40, 0.3).otherwise(0.0) +
            when(col("genres_watched") < 3, 0.1).otherwise(0.0))
        .withColumn("engagement_score",
          col("total_content_watched").cast("double") * 0.2 +
            col("avg_completion_rate") * 0.3 +
            col("devices_used").cast("double") * 0.1 +
            col("genres_watched").cast("double") * 0.1 +
            col("watchlist_items").cast("double") * 0.1 +
            col("ratings_given").cast("double") * 0.1 +
            col("recent_views").cast("double") /
              greatest(lit(1.0), col("active_days").cast("double")) * 0.1)

      val pred = ltv
        .withColumn("predicted_remaining_months",
          when(col("engagement_score") > 20, 24)
            .when(col("engagement_score") > 16, 12)
            .when(col("engagement_score") > 12, 6)
            .otherwise(3).cast("double") * (lit(1) - col("churn_probability")))
        .withColumn("historical_revenue",
          col("active_days").cast("double") * col("monthly_value"))
        .withColumn("predicted_future_ltv",
          col("predicted_remaining_months") * col("monthly_value"))
        .withColumn("total_predicted_ltv",
          col("historical_revenue") + col("predicted_remaining_months") * col("monthly_value"))

      pred
        .withColumn("ltv_segment",
          when(col("total_predicted_ltv") > 500, "VIP")
            .when(col("total_predicted_ltv") > 350, "High Value")
            .when(col("total_predicted_ltv") > 200, "Medium Value")
            .otherwise("Low Value"))
        .withColumn("retention_priority",
          when(col("churn_probability") > 0.5 && col("total_predicted_ltv") > 250,
            "High Priority Retention")
            .when(col("churn_probability") > 0.5 && col("total_predicted_ltv") > 150,
              "Medium Priority Retention")
            .when(col("churn_probability") > 0.3, "Monitor")
            .otherwise("Healthy"))
        .select(col("user_id"), col("subscription_type"), col("country"),
          col("engagement_score"), col("churn_probability"), col("historical_revenue"),
          col("predicted_future_ltv"), col("total_predicted_ltv"), col("ltv_segment"),
          col("retention_priority"))
        .orderBy(col("total_predicted_ltv").desc, col("user_id"))
    }
  }

  val q56: Q = q56For(defaultAsOf, defaultTenureDays)

  def all: Seq[Q] = Seq(q56)
}
