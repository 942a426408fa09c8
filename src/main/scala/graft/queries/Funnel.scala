package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.det._
import graft.operators.Sessionize

/** Cohort / funnel / sessionization queries (SURVEY.md §2 q19–q21).
  *
  * Re-expresses: monthly cohort analysis (/root/reference/SQL/Content
  * Performance with Cohort Analysis.txt), multi-stage CTE funnels
  * (18 of 20 reference SQL files open with WITH; e.g.
  * /root/reference/SQL/User Engagement Funnel Analysis.txt,
  * Content Catalog Gap Analysis.txt:3-137), and gap sessionization
  * (/root/reference/SQL/Real-time Personalization Effectiveness.txt
  * session blocks, /root/reference/SQL/Binge-Watching Behavior
  * Analysis.txt:13-24 LAG-gap pattern).
  *
  * CTEs are expressed as named intermediate DataFrames — Catalyst
  * inlines them into one plan, so "CTE chains" cost nothing extra.
  */
object Funnel {

  /** q19: month cohorts — first-order month × activity month, observed
    * over an asOf-anchored window ([[graft.AsOf]]: the reference's
    * `date_sub(current_date, N)` idiom as plan-time literals pushed to
    * the orders scan; oracle generated from the same parameter). Month
    * buckets are formatted as strings on both engines so no timestamp
    * dtype coupling exists in the compare.
    */
  def q19For(asOf: graft.AsOf, lookbackDays: Int): Q = {
    val start = asOf.minusDays(lookbackDays)
    Q.of(
      "q19_date_buckets",
      s"""WITH o AS (
        |  SELECT * FROM orders
        |  WHERE o_orderdate > ${start.sqlTs} AND o_orderdate <= ${asOf.sqlTs}
        |), firsts AS (
        |  SELECT o_custkey, strftime(MIN(o_orderdate), '%Y-%m') AS cohort
        |  FROM o GROUP BY o_custkey
        |)
        |SELECT cohort, strftime(o_orderdate, '%Y-%m') AS ym,
        |  COUNT(*) AS n_orders,
        |  COUNT(DISTINCT o.o_custkey) AS n_customers,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 END) AS DOUBLE)
        |    / COUNT(*) AS weekend_share
        |FROM o JOIN firsts ON o.o_custkey = firsts.o_custkey
        |GROUP BY cohort, ym
        |ORDER BY cohort, ym""".stripMargin) { t =>
    val o = t.orders
      .filter(col("o_orderdate") > start.tsLit && col("o_orderdate") <= asOf.tsLit)
    val firsts = o
      .groupBy(col("o_custkey").as("f_custkey"))
      .agg(date_format(min(col("o_orderdate")), "yyyy-MM").as("cohort"))
    o
      .join(firsts, col("o_custkey") === col("f_custkey"))
      .groupBy(col("cohort"), date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        dsum(col("o_totalprice")).as("revenue"),
        // weekend ratio (ref: Binge-Watching weekend_binge_ratio —
        // dayofweek + isin). Spark numbers days 1=Sun..7, DuckDB
        // 0=Sun..6, so the literal sets differ while the predicate is
        // identical; exact int counts → one double division.
        (count(when(dayofweek(col("o_orderdate")).isin(1, 7), 1)).cast("double")
          / count(lit(1))).as("weekend_share"))
      .orderBy(col("cohort"), col("ym"))
    }
  }

  /** Pinned: cohorts observed 1997-01-01..2000-12-31 — drops the
    * 1995–96 head of the data so the window genuinely bites.
    */
  val q19: Q = q19For(graft.AsOf("2000-12-31"), 1460)

  /** q20: 4-stage event funnel (signup → view → click → purchase, each
    * stage strictly after the previous) with conversion ratios — the
    * reference's CTE-funnel shape.
    *
    * Plan shape (VERDICT r3 #6): ONE scan of events (stage types
    * pushed to the parquet scan) and ONE exchange on user_id. The four
    * stage timestamps are a chained window cascade over the same
    * partitioning — `t_view = min(ts where type='view' and
    * ts > t_signup) over (partition by user_id)` and so on — so each
    * stage's predicate sees the previous stage's result without
    * re-joining the fact table, and the per-user rollup reuses the
    * window's partitioning with no further shuffle. The r3 form
    * scanned and re-shuffled the full events table once per stage
    * (four fact scans) — the shape you'd rewrite at 100 TB of events.
    */
  def q20For(asOf: graft.AsOf, windowDays: Int): Q = {
    val start = asOf.minusDays(windowDays)
    Q.of(
      "q20_funnel_cte",
      s"""WITH ev AS (SELECT user_id, ts, event_type FROM events
      |           WHERE ts > ${start.sqlTs} AND ts <= ${asOf.sqlTs}),
      |su AS (SELECT user_id, MIN(ts) AS t FROM ev WHERE event_type = 'signup' GROUP BY user_id),
      |v AS (SELECT e.user_id, MIN(e.ts) AS t FROM ev e JOIN su ON e.user_id = su.user_id
      |      WHERE e.event_type = 'view' AND e.ts > su.t GROUP BY e.user_id),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t FROM ev e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t FROM ev e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id)
      |SELECT (SELECT COUNT(*) FROM su) AS n_signup,
      |  (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_click,
      |  (SELECT COUNT(*) FROM p) AS n_purchase,
      |  CAST((SELECT COUNT(*) FROM v) AS DOUBLE) / NULLIF((SELECT COUNT(*) FROM su), 0) AS view_rate,
      |  CAST((SELECT COUNT(*) FROM c) AS DOUBLE) / NULLIF((SELECT COUNT(*) FROM v), 0) AS click_rate,
      |  CAST((SELECT COUNT(*) FROM p) AS DOUBLE) / NULLIF((SELECT COUNT(*) FROM c), 0) AS purchase_rate""".stripMargin) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    def stageMin(tpe: String, after: Option[String]): org.apache.spark.sql.Column = {
      val hit = after match {
        case None       => col("event_type") === tpe
        case Some(prev) => col("event_type") === tpe && col("ts") > col(prev)
      }
      min(when(hit, col("ts"))).over(w)
    }
    val staged = t.events
      .filter(col("ts") > start.tsLit && col("ts") <= asOf.tsLit &&
        col("event_type").isin("signup", "view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t_su", stageMin("signup", None))
      .withColumn("t_v", stageMin("view", Some("t_su")))
      .withColumn("t_c", stageMin("click", Some("t_v")))
      .withColumn("t_p", stageMin("purchase", Some("t_c")))
    // per-user collapse reuses the window partitioning (no exchange);
    // a user missing stage k has t_k null through the whole cascade,
    // so count(t_k) is exactly the per-stage funnel population
    staged.groupBy(col("user_id"))
      .agg(max(col("t_su")).as("t_su"), max(col("t_v")).as("t_v"),
        max(col("t_c")).as("t_c"), max(col("t_p")).as("t_p"))
      .agg(count(col("t_su")).as("n_signup"), count(col("t_v")).as("n_view"),
        count(col("t_c")).as("n_click"), count(col("t_p")).as("n_purchase"))
      .withColumn("view_rate", col("n_view").cast("double") / nullif(col("n_signup"), lit(0L)))
      .withColumn("click_rate", col("n_click").cast("double") / nullif(col("n_view"), lit(0L)))
      .withColumn("purchase_rate", col("n_purchase").cast("double") / nullif(col("n_click"), lit(0L)))
    }
  }

  /** Pinned: a 21-day funnel window off 2024-01-31 — users whose first
    * in-window signup is after Jan 10 re-enter each stage, so the
    * window changes (and the oracle re-derives) every stage count.
    */
  val q20: Q = q20For(graft.AsOf("2024-01-31"), 21)

  /** q21: gap sessionization (30-min gap) via the Sessionize operator,
    * rolled up to one row per session. The operator is one shuffle on
    * user_id; the session rollup reuses the same partitioning, so
    * Catalyst plans a single exchange.
    */
  val q21 = Q.of(
    "q21_sessionize",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), seqd AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged
      |)
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
      |FROM seqd
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin) { t =>
    Sessionize.byGap(t.events, col("user_id"), col("ts"), col("event_id"), gapSeconds = 1800L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  def all: Seq[Q] = Seq(q19, q20, q21)
}
