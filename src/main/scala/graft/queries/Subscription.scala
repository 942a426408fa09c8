package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{AsOf, Q}
import graft.Dims.dimBroadcast
import graft.functions.det._

/** q55: the sixth full reference analysis end-to-end — Subscription
  * Upgrade-Downgrade Patterns (/root/reference/SQL/Subscription
  * Upgrade-Downgrade Patterns.txt:1-160; pyspark twin) as one
  * oracle-checked composition: plan-change detection via LAG over the
  * purchase stream → the reference's three correlated "user metrics
  * before change" subqueries (content watched, completion rate,
  * payment count) PLUS the demographics window (profiles, devices)
  * PLUS the forward-looking `NOT EXISTS cancellation` success check,
  * all fused into ONE co-partitioned interval join + conditional
  * aggregate → revenue impact from the plan price ladder →
  * change-pattern classification → per-(type, pattern, region)
  * predictors with HAVING → opportunity score + intervention ladder →
  * the final correlated target-count subquery as a broadcast
  * band-join against a per-user frame, and the subscriber-count
  * scalar subquery as a broadcast lookup.
  *
  * Reference → testdata mapping (SURVEY §3): subscription_changes →
  * 'purchase' events with the plan derived from the purchase value
  * (<10 basic \$9.99, <20 premium \$15.99, else family \$19.99; a
  * change is a purchase whose plan differs from the user's previous
  * purchase — laterals excluded), viewing_history→'view' events
  * (completion→value, content_id→props.k), payments→'purchase'
  * events, cancellation→'error' events with value>50,
  * profiles→distinct 'click' content, devices→distinct event types,
  * users→customer on user_id=c_custkey, country→region name. The
  * events table spans one month, so the reference's 365/90/60/30-day
  * windows rescale to 21/9/6/3 days (same adaptation as q46/q48);
  * CASE thresholds are tuned so every pattern and intervention branch
  * is populated at sf0.001/0.01/0.1.
  *
  * Plan shape at scale: the change stream derives from one purchase
  * scan + one user_id exchange (the LAG window); the behavior scan
  * ships slim (user, ts, type, value, content) rows through its own
  * user_id exchange; the interval join is then co-partitioned on
  * user_id and the per-change aggregate groups on (user_id, change_id,
  * …carried) — user_id is in the grouping key, so the join's
  * partitioning satisfies it and NO per-change reshuffle exists
  * (pinned in the spec: zero exchanges on change_id). The recent-flag
  * frame reuses the same window partitioning; current-plan election is
  * max_by over the purchase scan; everything downstream of the
  * predictors groupBy is ≤(2·patterns·regions) rows, and the target
  * band-join broadcasts that tiny frame against the per-user frame.
  */
object Subscription {

  /** Signups cluster in week one and events end Jan 30: asOf Jan 28
    * with a 21-day lookback keeps a 6-day forward cancellation window
    * mostly observable while the change stream stays dense.
    */
  val defaultAsOf: AsOf = AsOf("2024-01-28")
  val defaultLookbackDays = 21

  private val ContentWinDays = 3
  private val PaymentWinDays = 9
  private val DemoWinDays = 6
  private val ForwardWinDays = 6
  private val RecentWinDays = 9

  def q55For(asOf: AsOf, lookbackDays: Int): Q = {
    val start = asOf.minusDays(lookbackDays)
    val recent = asOf.minusDays(RecentWinDays)

    Q.of(
      "q55_subscription_patterns",
      s"""WITH px AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN value < 10 THEN 'basic' WHEN value < 20 THEN 'premium' ELSE 'family' END AS new_plan,
        |    CASE WHEN value < 10 THEN 1 WHEN value < 20 THEN 2 ELSE 3 END AS new_rank
        |  FROM events WHERE event_type = 'purchase' AND ts <= ${asOf.sqlTs}
        |), ch0 AS (
        |  SELECT user_id, ts AS change_ts, event_id AS change_id, new_plan, new_rank,
        |    lag(new_plan) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS old_plan,
        |    lag(new_rank) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS old_rank
        |  FROM px
        |), chg AS (
        |  SELECT *, CASE WHEN new_rank > old_rank THEN 'upgrade' ELSE 'downgrade' END AS change_type,
        |    CAST(CASE new_plan WHEN 'basic' THEN 9.99 WHEN 'premium' THEN 15.99 ELSE 19.99 END AS DOUBLE)
        |      - CAST(CASE old_plan WHEN 'basic' THEN 9.99 WHEN 'premium' THEN 15.99 ELSE 19.99 END AS DOUBLE) AS revenue_impact
        |  FROM ch0
        |  WHERE old_plan IS NOT NULL AND new_rank <> old_rank
        |    AND change_ts > ${start.sqlTs}
        |), ev AS (
        |  SELECT user_id, ts, event_type, value,
        |    CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS content_id
        |  FROM events WHERE event_type IN ('view','click','purchase','error')
        |), m AS (
        |  SELECT c.change_id,
        |    COUNT(DISTINCT CASE WHEN e.event_type='view' AND e.ts > c.change_ts - INTERVAL $ContentWinDays DAY AND e.ts <= c.change_ts THEN e.content_id END) AS content_watched,
        |    CAST(SUM(CASE WHEN e.event_type='view' AND e.ts > c.change_ts - INTERVAL $ContentWinDays DAY AND e.ts <= c.change_ts THEN CAST(e.value AS DECIMAL(20,6)) END) AS DOUBLE)
        |      / COUNT(CASE WHEN e.event_type='view' AND e.ts > c.change_ts - INTERVAL $ContentWinDays DAY AND e.ts <= c.change_ts THEN 1 END) AS completion_rate,
        |    COUNT(CASE WHEN e.event_type='purchase' AND e.ts > c.change_ts - INTERVAL $PaymentWinDays DAY AND e.ts <= c.change_ts THEN 1 END) AS payment_count,
        |    COUNT(DISTINCT CASE WHEN e.event_type='click' AND e.ts > c.change_ts - INTERVAL $DemoWinDays DAY AND e.ts <= c.change_ts THEN e.content_id END) AS profiles_created,
        |    COUNT(DISTINCT CASE WHEN e.ts > c.change_ts - INTERVAL $DemoWinDays DAY AND e.ts <= c.change_ts THEN e.event_type END) AS devices_used,
        |    MAX(CASE WHEN e.event_type='error' AND e.value > 50 AND e.ts > c.change_ts AND e.ts <= c.change_ts + INTERVAL $ForwardWinDays DAY THEN 1 ELSE 0 END) AS cancelled_after
        |  FROM chg c LEFT JOIN ev e ON e.user_id = c.user_id
        |    AND e.ts > c.change_ts - INTERVAL $PaymentWinDays DAY AND e.ts <= c.change_ts + INTERVAL $ForwardWinDays DAY
        |  GROUP BY c.change_id
        |), su AS (
        |  SELECT user_id, MIN(ts) AS signup_ts FROM events
        |  WHERE event_type='signup' AND ts <= ${asOf.sqlTs} GROUP BY user_id
        |), ca AS (
        |  SELECT c.*, m.content_watched, m.completion_rate, m.payment_count,
        |    m.profiles_created, m.devices_used, m.cancelled_after,
        |    r.r_name AS region,
        |    CAST(date_diff('day', CAST(su.signup_ts AS DATE), CAST(c.change_ts AS DATE)) AS BIGINT) AS days_since_signup,
        |    CASE WHEN c.change_type='upgrade' AND CAST(date_diff('day', CAST(su.signup_ts AS DATE), CAST(c.change_ts AS DATE)) AS BIGINT) < 10 THEN 'Early Upgrade'
        |         WHEN c.change_type='upgrade' AND m.content_watched >= 2 THEN 'Usage-Based Upgrade'
        |         WHEN c.change_type='downgrade' AND m.content_watched <= 1 THEN 'Underutilization Downgrade'
        |         WHEN c.change_type='downgrade' AND m.payment_count > 3 THEN 'Payment Issue Downgrade'
        |         ELSE 'Other' END AS change_pattern
        |  FROM chg c
        |  JOIN m ON m.change_id = c.change_id
        |  JOIN su ON su.user_id = c.user_id
        |  JOIN customer cu ON cu.c_custkey = c.user_id
        |  JOIN nation n ON n.n_nationkey = cu.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |), up AS (
        |  SELECT change_type, change_pattern, region,
        |    COUNT(*) AS change_count,
        |    CAST(CAST(SUM(content_watched) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_content_watched,
        |    CAST(SUM(CAST(completion_rate AS DECIMAL(20,6))) AS DOUBLE) / COUNT(completion_rate) AS avg_completion_rate,
        |    CAST(CAST(SUM(days_since_signup) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_days_since_signup,
        |    CAST(CAST(SUM(profiles_created) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_profiles,
        |    CAST(CAST(SUM(devices_used) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_devices,
        |    CAST(SUM(1 - cancelled_after) AS DOUBLE) * 100.0 / COUNT(*) AS success_rate_pct
        |  FROM ca GROUP BY 1, 2, 3
        |  HAVING COUNT(*) >= 3
        |), ro AS (
        |  SELECT *,
        |    success_rate_pct * 0.4 + CAST(change_count AS DOUBLE) * 0.0001 * 0.3 +
        |      CASE WHEN change_type = 'upgrade' THEN avg_content_watched * 0.3 ELSE CAST(0 AS DOUBLE) END AS opportunity_score,
        |    CASE WHEN change_pattern = 'Underutilization Downgrade' AND avg_completion_rate > 45 THEN 'Content Recommendations'
        |         WHEN change_pattern = 'Early Upgrade' AND avg_days_since_signup < 7 THEN 'Welcome Offer'
        |         WHEN change_pattern = 'Usage-Based Upgrade' AND avg_devices > 3.8 THEN 'Family Plan Promotion'
        |         WHEN success_rate_pct < 60 THEN 'Post-Change Engagement Campaign'
        |         ELSE 'Standard Retention Program' END AS intervention_strategy
        |  FROM up
        |), ruc AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN change_type='upgrade' AND change_ts > ${recent.sqlTs} THEN 1 ELSE 0 END) AS ru,
        |    MAX(CASE WHEN change_type='downgrade' AND change_ts > ${recent.sqlTs} THEN 1 ELSE 0 END) AS rd
        |  FROM chg GROUP BY user_id
        |), uf AS (
        |  SELECT cu.c_custkey AS user_id, r.r_name AS region,
        |    CAST(date_diff('day', CAST(su.signup_ts AS DATE), DATE '${asOf.date}') AS BIGINT) AS dss,
        |    COALESCE(ruc.ru, 0) AS ru, COALESCE(ruc.rd, 0) AS rd
        |  FROM customer cu
        |  JOIN nation n ON n.n_nationkey = cu.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  JOIN su ON su.user_id = cu.c_custkey
        |  LEFT JOIN ruc ON ruc.user_id = cu.c_custkey
        |), cp AS (
        |  SELECT user_id, new_plan AS cur_plan FROM (
        |    SELECT user_id, new_plan, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM px) t WHERE rn = 1
        |), sc AS (
        |  SELECT uf.region, cp.cur_plan, COUNT(*) AS subscribers
        |  FROM cp JOIN uf ON uf.user_id = cp.user_id
        |  GROUP BY 1, 2
        |), tgt AS (
        |  SELECT ro.change_type, ro.change_pattern, ro.region, COUNT(DISTINCT uf.user_id) AS potential_target_users
        |  FROM ro LEFT JOIN uf ON uf.region = ro.region
        |    AND uf.dss BETWEEN ro.avg_days_since_signup - 10 AND ro.avg_days_since_signup + 10
        |    AND (CASE WHEN ro.change_type = 'upgrade' THEN uf.ru ELSE uf.rd END) = 0
        |  GROUP BY 1, 2, 3
        |)
        |SELECT ro.change_type, ro.change_pattern, ro.region, ro.change_count,
        |  ro.avg_content_watched, ro.avg_completion_rate, ro.avg_days_since_signup,
        |  ro.avg_profiles, ro.avg_devices, ro.success_rate_pct, ro.opportunity_score,
        |  ro.intervention_strategy, tgt.potential_target_users,
        |  ro.opportunity_score * 0.01 * CAST(COALESCE(sc.subscribers, 0) AS DOUBLE) *
        |    (CASE WHEN ro.change_type = 'upgrade' THEN 6.0 ELSE -6.0 END) AS estimated_annual_impact
        |FROM ro
        |JOIN tgt ON tgt.change_type = ro.change_type AND tgt.change_pattern = ro.change_pattern AND tgt.region = ro.region
        |LEFT JOIN sc ON sc.region = ro.region
        |  AND sc.cur_plan = CASE WHEN ro.change_type = 'upgrade' THEN 'basic' ELSE 'family' END
        |ORDER BY ro.opportunity_score DESC, ro.change_type, ro.change_pattern, ro.region""".stripMargin) { t =>
      def planOf(v: Column): Column =
        when(v < 10, "basic").when(v < 20, "premium").otherwise("family")
      def rankOf(v: Column): Column =
        when(v < 10, 1).when(v < 20, 2).otherwise(3)
      def priceOf(p: Column): Column =
        when(p === "basic", 9.99).when(p === "premium", 15.99).otherwise(19.99)
      def daysBack(n: Int): Column = expr(s"INTERVAL $n DAYS")

      val px = t.events
        .filter(col("event_type") === "purchase" && col("ts") <= asOf.tsLit)
        .select(col("user_id"), col("ts"), col("event_id"),
          planOf(col("value")).as("new_plan"), rankOf(col("value")).as("new_rank"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val chg = px
        .withColumn("old_plan", lag(col("new_plan"), 1).over(w))
        .withColumn("old_rank", lag(col("new_rank"), 1).over(w))
        .filter(col("old_plan").isNotNull && col("new_rank") =!= col("old_rank") &&
          col("ts") > start.tsLit)
        .select(col("user_id"), col("ts").as("change_ts"), col("event_id").as("change_id"),
          col("new_plan"), col("old_plan"),
          when(col("new_rank") > col("old_rank"), "upgrade").otherwise("downgrade")
            .as("change_type"),
          (priceOf(col("new_plan")) - priceOf(col("old_plan"))).as("revenue_impact"))

      val ev = t.events
        .filter(col("event_type").isin("view", "click", "purchase", "error"))
        .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
          col("event_type").as("e_type"), col("value").as("e_value"),
          regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("content_id"))

      // The reference's three correlated per-change subqueries, the
      // demographics window, and the forward NOT-EXISTS cancellation
      // check share one interval join over the hull window
      // [change−9d, change+6d]; user_id stays in the grouping key so
      // the join's user_id co-partitioning satisfies the aggregate —
      // no per-change reshuffle.
      val inView = col("e_type") === "view" &&
        col("e_ts") > col("change_ts") - daysBack(ContentWinDays) &&
        col("e_ts") <= col("change_ts")
      val inPay = col("e_type") === "purchase" &&
        col("e_ts") > col("change_ts") - daysBack(PaymentWinDays) &&
        col("e_ts") <= col("change_ts")
      val inDemo = col("e_ts") > col("change_ts") - daysBack(DemoWinDays) &&
        col("e_ts") <= col("change_ts")
      val inCancel = col("e_type") === "error" && col("e_value") > 50 &&
        col("e_ts") > col("change_ts") &&
        col("e_ts") <= col("change_ts") + daysBack(ForwardWinDays)

      val cells = chg
        .join(ev,
          col("e_user") === col("user_id") &&
            col("e_ts") > col("change_ts") - daysBack(PaymentWinDays) &&
            col("e_ts") <= col("change_ts") + daysBack(ForwardWinDays),
          "left")
        .groupBy(col("user_id"), col("change_id"), col("change_ts"), col("new_plan"),
          col("old_plan"), col("change_type"), col("revenue_impact"))
        .agg(
          // size(collect_set), not countDistinct: three distinct aggs
          // would plan through Expand (4× the joined rows reshuffled on
          // the full grouping+gid key); a set per group is single-phase,
          // reuses the join's user_id partitioning, and is bounded by
          // the per-user event count, which does not grow with corpus
          // scale (more users, not more events per user)
          size(collect_set(when(inView, col("content_id")))).cast("long")
            .as("content_watched"),
          (dsum(when(inView, col("e_value"))) / count(when(inView, lit(1))))
            .as("completion_rate"),
          count(when(inPay, lit(1))).as("payment_count"),
          size(collect_set(when(inDemo && col("e_type") === "click", col("content_id"))))
            .cast("long").as("profiles_created"),
          size(collect_set(when(inDemo, col("e_type")))).cast("long").as("devices_used"),
          max(when(inCancel, 1).otherwise(0)).as("cancelled_after"))

      val su = t.events
        .filter(col("event_type") === "signup" && col("ts") <= asOf.tsLit)
        .groupBy(col("user_id").as("su_user"))
        .agg(min(col("ts")).as("signup_ts"))
      val cust = t.customer
        .join(dimBroadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(dimBroadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name").as("region"))

      val ca = cells
        .join(su, col("su_user") === col("user_id"))
        .join(cust, col("c_custkey") === col("user_id"))
        .withColumn("days_since_signup",
          datediff(col("change_ts").cast("date"), col("signup_ts").cast("date")).cast("long"))
        .withColumn("change_pattern",
          when(col("change_type") === "upgrade" && col("days_since_signup") < 10,
            "Early Upgrade")
            .when(col("change_type") === "upgrade" && col("content_watched") >= 2,
              "Usage-Based Upgrade")
            .when(col("change_type") === "downgrade" && col("content_watched") <= 1,
              "Underutilization Downgrade")
            .when(col("change_type") === "downgrade" && col("payment_count") > 3,
              "Payment Issue Downgrade")
            .otherwise("Other"))

      val up = ca.groupBy(col("change_type"), col("change_pattern"), col("region"))
        .agg(
          count(lit(1)).as("change_count"),
          (sum(col("content_watched")).cast("double") / count(lit(1)))
            .as("avg_content_watched"),
          (dsum(col("completion_rate")) / count(col("completion_rate")))
            .as("avg_completion_rate"),
          (sum(col("days_since_signup")).cast("double") / count(lit(1)))
            .as("avg_days_since_signup"),
          (sum(col("profiles_created")).cast("double") / count(lit(1))).as("avg_profiles"),
          (sum(col("devices_used")).cast("double") / count(lit(1))).as("avg_devices"),
          (sum(lit(1) - col("cancelled_after")).cast("double") * 100.0 / count(lit(1)))
            .as("success_rate_pct"))
        .filter(col("change_count") >= 3)

      val ro = up
        .withColumn("opportunity_score",
          col("success_rate_pct") * 0.4 +
            col("change_count").cast("double") * 0.0001 * 0.3 +
            when(col("change_type") === "upgrade", col("avg_content_watched") * 0.3)
              .otherwise(lit(0.0)))
        .withColumn("intervention_strategy",
          when(col("change_pattern") === "Underutilization Downgrade" &&
            col("avg_completion_rate") > 45, "Content Recommendations")
            .when(col("change_pattern") === "Early Upgrade" &&
              col("avg_days_since_signup") < 7, "Welcome Offer")
            .when(col("change_pattern") === "Usage-Based Upgrade" &&
              col("avg_devices") > 3.8, "Family Plan Promotion")
            .when(col("success_rate_pct") < 60, "Post-Change Engagement Campaign")
            .otherwise("Standard Retention Program"))

      // Per-user frame for the final correlated subqueries: recent
      // change flags reuse chg's user_id partitioning; current plan is
      // a max_by election over the purchase scan (≡ the oracle's
      // row_number DESC pick — (ts, event_id) is unique).
      val ruc = chg.groupBy(col("user_id").as("ruc_user"))
        .agg(
          max(when(col("change_type") === "upgrade" && col("change_ts") > recent.tsLit, 1)
            .otherwise(0)).as("ru"),
          max(when(col("change_type") === "downgrade" && col("change_ts") > recent.tsLit, 1)
            .otherwise(0)).as("rd"))
      val uf = cust.select(col("c_custkey").as("uf_user"), col("region").as("uf_region"))
        .join(su, col("su_user") === col("uf_user"))
        .join(ruc, col("ruc_user") === col("uf_user"), "left")
        .select(col("uf_user"), col("uf_region"),
          datediff(lit(java.sql.Date.valueOf(asOf.date)), col("signup_ts").cast("date"))
            .cast("long").as("dss"),
          coalesce(col("ru"), lit(0)).as("ru"), coalesce(col("rd"), lit(0)).as("rd"))
      val cp = px.groupBy(col("user_id").as("cp_user"))
        .agg(max_by(col("new_plan"), struct(col("ts"), col("event_id"))).as("cur_plan"))
      val sc = cp.join(uf, col("uf_user") === col("cp_user"))
        .groupBy(col("uf_region").as("s_region"), col("cur_plan"))
        .agg(count(lit(1)).as("subscribers"))

      // The reference's correlated target-count subquery: broadcast
      // the tiny predictor frame against the per-user frame (region
      // equi key + signup-age band + recent-change flag), then LEFT
      // JOIN the counts back so bandless rows keep 0.
      val roSlim = ro.select(col("change_type").as("t_type"),
        col("change_pattern").as("t_pat"), col("region").as("t_region"),
        col("avg_days_since_signup").as("t_dss"))
      val cnts = broadcast(roSlim)
        .join(uf,
          col("uf_region") === col("t_region") &&
            col("dss") >= col("t_dss") - 10 && col("dss") <= col("t_dss") + 10 &&
            when(col("t_type") === "upgrade", col("ru")).otherwise(col("rd")) === 0)
        .groupBy(col("t_type"), col("t_pat"), col("t_region"))
        .agg(countDistinct(col("uf_user")).as("potential_target_users"))

      ro
        .join(cnts,
          col("t_type") === col("change_type") && col("t_pat") === col("change_pattern") &&
            col("t_region") === col("region"), "left")
        .join(broadcast(sc),
          col("s_region") === col("region") &&
            col("cur_plan") ===
              when(col("change_type") === "upgrade", "basic").otherwise("family"),
          "left")
        .select(col("change_type"), col("change_pattern"), col("region"),
          col("change_count"), col("avg_content_watched"), col("avg_completion_rate"),
          col("avg_days_since_signup"), col("avg_profiles"), col("avg_devices"),
          col("success_rate_pct"), col("opportunity_score"), col("intervention_strategy"),
          coalesce(col("potential_target_users"), lit(0L)).as("potential_target_users"),
          (col("opportunity_score") * 0.01 *
            coalesce(col("subscribers"), lit(0L)).cast("double") *
            when(col("change_type") === "upgrade", 6.0).otherwise(-6.0))
            .as("estimated_annual_impact"))
        .orderBy(col("opportunity_score").desc, col("change_type"),
          col("change_pattern"), col("region"))
    }
  }

  val q55: Q = q55For(defaultAsOf, defaultLookbackDays)

  def all: Seq[Q] = Seq(q55)
}
