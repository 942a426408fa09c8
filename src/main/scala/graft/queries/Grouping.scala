package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.det._
import graft.Dims.dimBroadcast

/** Grouping-sets / pivot / statistics queries (SURVEY.md §2 q11–q14,
  * q23, q25, q27).
  *
  * Re-expresses: rollup (/root/reference/pyspark/User Engagement Funnel
  * Analysis.py:42-43), pivot (4× in the reference, e.g.
  * /root/reference/pyspark/Content Catalog Gap Analysis.py:30),
  * stddev/corr statistics (/root/reference/SQL/Predictive Content
  * Performance Modeling.txt:102, Content Production ROI
  * Analysis.txt:115).
  *
  * Determinism: rollup/cube null group keys are COALESCEd to 'ALL' on
  * both engines (group keys are non-null in the data, so the sentinel
  * is unambiguous); statistics are computed from exact decimal moments
  * with the identical IEEE expression on both sides (det.scala).
  */
object Grouping {

  /** q11: stddev / variance / correlation per return flag, computed
    * from exact decimal moments so the oracle hash-matches bit-exactly.
    */
  val q11 = Q.of(
    "q11_stats_corr",
    """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  round(sqrt((n*sxx - sx*sx) / (n*(n-1))), 4) AS stddev_qty,
      |  round((n*sxx - sx*sx) / (n*(n-1)), 4) AS var_qty,
      |  round((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 4) AS corr_qty_price
      |FROM (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |ORDER BY l_returnflag""".stripMargin) { t =>
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(dstddev(col("l_quantity")), 4).as("stddev_qty"),
        round(dvar(col("l_quantity")), 4).as("var_qty"),
        round(dcorr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  /** q12: hierarchical rollup totals over (priority, status)
    * (ref: User Engagement Funnel Analysis.py:42 rollup).
    */
  val q12 = Q.of(
    "q12_rollup",
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin) { t =>
    t.orders
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total"))
      .orderBy(col("priority"), col("status"))
  }

  /** q13: cube over (market segment, nation) — all 4 grouping-set
    * combinations; nation dim is broadcast into the fact scan.
    */
  val q13 = Q.of(
    "q13_cube",
    """SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
      |  COALESCE(n_name, 'ALL') AS nation,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY CUBE(c_mktsegment, n_name)
      |ORDER BY segment, nation""".stripMargin) { t =>
    t.customer
      .join(dimBroadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .cube(col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total_bal"))
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n"), col("total_bal"))
      .orderBy(col("segment"), col("nation"))
  }

  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val priorityAlias = Map(
    "1-URGENT" -> "urgent", "2-HIGH" -> "high", "3-MEDIUM" -> "medium",
    "4-NOT SPECIFIED" -> "notspec", "5-LOW" -> "low")

  /** q14: wide pivot — revenue per nation × order priority (ref: 4×
    * pivot, e.g. Content Catalog Gap Analysis.py:30). Explicit pivot
    * values keep the plan single-pass (no values-discovery job).
    */
  val q14 = Q.of(
    "q14_pivot",
    """SELECT n_name,
      |  CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END AS DECIMAL(20,6))) AS DOUBLE) AS urgent,
      |  CAST(SUM(CAST(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END AS DECIMAL(20,6))) AS DOUBLE) AS high,
      |  CAST(SUM(CAST(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END AS DECIMAL(20,6))) AS DOUBLE) AS medium,
      |  CAST(SUM(CAST(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END AS DECIMAL(20,6))) AS DOUBLE) AS notspec,
      |  CAST(SUM(CAST(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END AS DECIMAL(20,6))) AS DOUBLE) AS low
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { t =>
    val wide = t.orders
      .join(dimBroadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(dimBroadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("o_orderpriority", priorities)
      .agg(dsum(col("o_totalprice")))
    priorityAlias.foldLeft(wide) { case (df, (v, alias)) => df.withColumnRenamed(v, alias) }
      .orderBy(col("n_name"))
  }

  /** q23: portable CASE-based manual pivot — daily event-type counts +
    * view→purchase conversion (no pivot operator; pure conditional
    * aggregation, the form that works on any SQL engine).
    */
  val q23 = Q.of(
    "q23_conditional_pivot_manual",
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
      |  CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
      |    / NULLIF(COUNT(CASE WHEN event_type = 'view' THEN 1 END), 0) AS purchase_per_view
      |FROM events
      |GROUP BY 1
      |ORDER BY day""".stripMargin) { t =>
    def n(tpe: String) = count(when(col("event_type") === tpe, 1)).as(s"n_$tpe")
    t.events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(n("view"), n("click"), n("purchase"), n("signup"), n("error"))
      .withColumn("purchase_per_view",
        col("n_purchase").cast("double") / nullif(col("n_view"), lit(0)))
      .orderBy(col("day"))
  }

  /** q25: approx_count_distinct (HLL++) — the scale path for
    * countDistinct when per-group key cardinality is unbounded
    * (SURVEY §5). Rows-only: sketch estimates are engine-specific; the
    * ±5% error bound vs the exact count is asserted in GroupingSpec.
    */
  val q25 = Q.rowsOnly("q25_approx_distinct") { t =>
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(
        approx_count_distinct(col("o_custkey")).as("approx_custs"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** q27: two-phase aggregate — per-order partial rollup, then re-agg
    * per status. The inner groupBy keys on the fact's natural key so
    * the partial (map-side) combine absorbs most of the data before the
    * only wide shuffle; the outer agg is over one row per order.
    */
  val q27 = Q.of(
    "q27_bucketed_groupby",
    """SELECT o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(n_lines) AS DOUBLE) / COUNT(*) AS avg_lines,
      |  CAST(SUM(CAST(order_value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
      |FROM (
      |  SELECT l_orderkey, COUNT(*) AS n_lines,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS order_value
      |  FROM lineitem GROUP BY l_orderkey
      |) JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { t =>
    val perOrder = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("order_value"))
    perOrder
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(col("n_lines")).cast("double") / count(lit(1))).as("avg_lines"),
        dsum(col("order_value")).as("total_value"))
      .orderBy(col("o_orderstatus"))
  }

  def all: Seq[Q] = Seq(q11, q12, q13, q14, q23, q25, q27)
}
