package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{AsOf, Q, Tables}
import graft.functions.det._
import graft.Dims.dimBroadcast

/** q46: the second full reference analysis end-to-end — User
  * Engagement Funnel Analysis (/root/reference/SQL/User Engagement
  * Funnel Analysis.txt:1-20; pyspark twin) as one oracle-checked
  * composition: signup-window filter (asOf-parameterized via
  * [[graft.AsOf]]) → per-user engagement metrics over the event
  * history → engagement + completion segment ladders → four-level
  * ROLLUP with HAVING.
  *
  * Reference → testdata mapping (SURVEY §3): users→customer joined on
  * events.user_id=c_custkey, signup_date→the user's first 'signup'
  * event, viewing_history→'view' events (completion_percentage→value,
  * content_id→props.k), watchlist→'click' events, profiles→'purchase'
  * events; subscription_type→c_mktsegment, country→region name.
  * Segment ladders keep the reference's exact engagement thresholds
  * (0 / ≤5 / ≤20 views); completion thresholds are rescaled to the
  * synthetic value range (reference: percent 50/80; here value 30/70).
  *
  * Plan shape at scale: ONE scan of the events fact (the event-type
  * filter pushed to parquet; the asOf upper bound is a plan-time
  * literal evaluated in the scan stage — it sits above the scan only
  * because events.ts is the nanos→micros projection, and would push
  * as a parquet filter on a micros-native deployment) and ONE
  * exchange on user_id — the signup timestamp is a window minimum over the same
  * partitioning the per-user aggregate then reuses (q20's cascade
  * shape), so the reference's four LEFT JOINs against the fact become
  * zero fact self-joins. The per-user frame (|users| rows) then joins
  * the customer dim with nation/region broadcast, and the final
  * ROLLUP groups a few hundred rows. The fact never shuffles for any
  * dim join.
  */
object Engagement {

  /** Pinned instance: events span 2024-01 and first signups cluster in
    * week one, so a 29-day window off 2024-01-31 (signups ≥ Jan 2)
    * genuinely bites at every SF (drops 6/15, 53/150, 554/1500 users)
    * while leaving every segment populated.
    */
  val defaultAsOf: AsOf = AsOf("2024-01-31")
  val defaultWindowDays = 29

  def q46For(asOf: AsOf, windowDays: Int): Q = {
    val start = asOf.minusDays(windowDays)

    Q.of(
      "q46_engagement_funnel",
      s"""WITH base AS (
        |  SELECT user_id, ts, event_type, value,
        |    CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS content_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t_signup
        |  FROM events
        |  WHERE ts <= ${asOf.sqlTs}
        |    AND event_type IN ('signup', 'view', 'click', 'purchase')
        |), met AS (
        |  SELECT user_id, MIN(t_signup) AS signup_ts,
        |    COUNT(CASE WHEN event_type = 'view' AND ts > t_signup THEN 1 END) AS total_views,
        |    COUNT(DISTINCT CASE WHEN event_type = 'view' AND ts > t_signup THEN content_id END) AS unique_content_watched,
        |    CAST(SUM(CASE WHEN event_type = 'view' AND ts > t_signup THEN CAST(value AS DECIMAL(20,6)) END) AS DOUBLE)
        |      / COUNT(CASE WHEN event_type = 'view' AND ts > t_signup THEN value END) AS avg_completion_rate,
        |    COUNT(DISTINCT CASE WHEN event_type = 'click' AND ts > t_signup THEN content_id END) AS watchlist_items,
        |    COUNT(CASE WHEN event_type = 'purchase' AND ts > t_signup THEN 1 END) AS purchases
        |  FROM base GROUP BY user_id
        |  HAVING MIN(t_signup) >= ${start.sqlTs}
        |), seg AS (
        |  SELECT c.c_mktsegment AS subscription_type, r.r_name AS region,
        |    m.total_views, m.unique_content_watched, m.avg_completion_rate, m.purchases,
        |    CASE WHEN m.total_views = 0 THEN 'Inactive'
        |         WHEN m.total_views <= 5 THEN 'Light User'
        |         WHEN m.total_views <= 20 THEN 'Medium User'
        |         ELSE 'Heavy User' END AS engagement_segment,
        |    CASE WHEN m.avg_completion_rate IS NULL THEN 'No Views'
        |         WHEN m.avg_completion_rate < 30 THEN 'Low Completion'
        |         WHEN m.avg_completion_rate < 70 THEN 'Medium Completion'
        |         ELSE 'High Completion' END AS completion_segment
        |  FROM met m
        |  JOIN customer c ON m.user_id = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |)
        |SELECT COALESCE(subscription_type, '(all)') AS subscription_type,
        |  COALESCE(region, '(all)') AS region,
        |  COALESCE(engagement_segment, '(all)') AS engagement_segment,
        |  COALESCE(completion_segment, '(all)') AS completion_segment,
        |  COUNT(*) AS user_count,
        |  CAST(SUM(unique_content_watched) AS DOUBLE) / COUNT(*) AS avg_unique_content,
        |  CAST(SUM(total_views) AS DOUBLE) / COUNT(*) AS avg_total_views,
        |  CAST(SUM(purchases) AS DOUBLE) / COUNT(*) AS avg_purchases,
        |  CAST(SUM(CAST(avg_completion_rate AS DECIMAL(20,6))) AS DOUBLE)
        |    / COUNT(avg_completion_rate) AS avg_completion
        |FROM seg
        |GROUP BY ROLLUP (subscription_type, region, engagement_segment, completion_segment)
        |HAVING COUNT(*) >= 2
        |ORDER BY subscription_type, user_count DESC, region, engagement_segment, completion_segment""".stripMargin) { t =>
      val w = Window.partitionBy(col("user_id"))
      val base = t.events
        .filter(col("ts") <= asOf.tsLit &&
          col("event_type").isin("signup", "view", "click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_type"), col("value"),
          regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("content_id"))
        .withColumn("t_signup",
          min(when(col("event_type") === "signup", col("ts"))).over(w))
      val postView = col("event_type") === "view" && col("ts") > col("t_signup")
      val postClick = col("event_type") === "click" && col("ts") > col("t_signup")
      val postBuy = col("event_type") === "purchase" && col("ts") > col("t_signup")
      val met = base.groupBy(col("user_id"))
        .agg(
          min(col("t_signup")).as("signup_ts"),
          count(when(postView, 1)).as("total_views"),
          countDistinct(when(postView, col("content_id"))).as("unique_content_watched"),
          // NO round: at corpus scale the quotient of 4-decimal-exact
          // sums lands on round() ties that Spark (exact-binary
          // HALF_UP) and DuckDB (x*1e4 float path) resolve differently
          // — caught at sf0.1; the unrounded quotient is expression-
          // identical on both sides
          (dsum(when(postView, col("value"))) /
            count(when(postView, col("value")))).as("avg_completion_rate"),
          countDistinct(when(postClick, col("content_id"))).as("watchlist_items"),
          count(when(postBuy, 1)).as("purchases"))
        .filter(col("signup_ts") >= start.tsLit)
      val cust = t.customer
        .join(dimBroadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(dimBroadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_mktsegment").as("subscription_type"),
          col("r_name").as("region"))
      val seg = met.join(cust, col("user_id") === col("c_custkey"))
        .withColumn("engagement_segment",
          when(col("total_views") === 0, "Inactive")
            .when(col("total_views") <= 5, "Light User")
            .when(col("total_views") <= 20, "Medium User")
            .otherwise("Heavy User"))
        .withColumn("completion_segment",
          when(col("avg_completion_rate").isNull, "No Views")
            .when(col("avg_completion_rate") < 30, "Low Completion")
            .when(col("avg_completion_rate") < 70, "Medium Completion")
            .otherwise("High Completion"))
      seg
        .rollup(col("subscription_type"), col("region"),
          col("engagement_segment"), col("completion_segment"))
        .agg(
          count(lit(1)).as("user_count"),
          (sum(col("unique_content_watched")).cast("double") / count(lit(1)))
            .as("avg_unique_content"),
          (sum(col("total_views")).cast("double") / count(lit(1))).as("avg_total_views"),
          (sum(col("purchases")).cast("double") / count(lit(1))).as("avg_purchases"),
          // NO round here: the inputs are exact 4-decimal values, so
          // sum/count lands on 5th-decimal ties where the engines'
          // round() disagree — the unrounded quotient is an identical
          // IEEE expression on both sides and compares bit-exact
          (dsum(col("avg_completion_rate")) / count(col("avg_completion_rate")))
            .as("avg_completion"))
        .filter(col("user_count") >= 2)
        .select(
          coalesce(col("subscription_type"), lit("(all)")).as("subscription_type"),
          coalesce(col("region"), lit("(all)")).as("region"),
          coalesce(col("engagement_segment"), lit("(all)")).as("engagement_segment"),
          coalesce(col("completion_segment"), lit("(all)")).as("completion_segment"),
          col("user_count"), col("avg_unique_content"), col("avg_total_views"),
          col("avg_purchases"), col("avg_completion"))
        .orderBy(col("subscription_type"), col("user_count").desc, col("region"),
          col("engagement_segment"), col("completion_segment"))
    }
  }

  val q46: Q = q46For(defaultAsOf, defaultWindowDays)

  def all: Seq[Q] = Seq(q46)
}
