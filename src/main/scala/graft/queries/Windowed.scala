package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.det._
import graft.operators.TopK

/** Window-analytics queries (SURVEY.md §2 q06–q10, q24, q28).
  *
  * Re-expresses the reference's window-function surface: lag/lead gap
  * detection (/root/reference/SQL/Binge-Watching Behavior
  * Analysis.txt:13-24), running totals and season-over-season deltas
  * (/root/reference/SQL/Seasonal Viewing Pattern Analysis.txt:55-58),
  * percentile ranks (/root/reference/SQL/User Lifetime Value
  * Prediction.txt), percentile_cont (/root/reference/SQL/Infrastructure
  * Cost Optimization by Content Type.txt:88-91), and first/last value
  * per window (/root/reference/SQL/Subscription Upgrade-Downgrade
  * Patterns.txt).
  *
  * Scale rules (SURVEY §5): every window is partitioned — the shuffle
  * is one hash exchange on the partition key and the frame is streamed,
  * so per-task state is O(frame), never O(partition-count). Running
  * sums go through DECIMAL(20,6) so the window aggregate is
  * order-exact and hash-matches the DuckDB oracle.
  */
object Windowed {

  /** q06: lag/lead deltas + day gaps per customer order sequence. */
  val q06 = Q.of(
    "q06_window_lag_lead",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  lag(o_totalprice)  OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  o_totalprice - lag(o_totalprice) OVER w AS price_delta,
      |  date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS days_since_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { t =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t.orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("price_delta", col("o_totalprice") - col("prev_price"))
      .withColumn("days_since_prev",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast("long"))
      .drop("o_orderdate")
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q07: cumulative spend + 3-order moving average per customer.
    * Decimal-routed window sums are order-exact (det.scala).
    */
  val q07 = Q.of(
    "q07_running_total",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER w AS seq,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mavg3
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, seq""".stripMargin) { t =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m3 = w.rowsBetween(-2, Window.currentRow)
    t.orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("cum_spend", sum(col("o_totalprice").cast(D20_6)).over(cum).cast("double"))
      .withColumn("mavg3",
        sum(col("o_totalprice").cast(D20_6)).over(m3).cast("double") / count(lit(1)).over(m3))
      .drop("o_orderdate")
      .orderBy(col("o_custkey"), col("seq"))
  }

  /** q08: top-3 parts per brand by retail price, via the TopK operator.
    * Spark 4 plans this as partial+final WindowGroupLimit, so each map
    * task ships at most k rows per group into the exchange (verified in
    * RelationalSpec) — the scale-safe top-k shape.
    */
  val q08 = Q.of(
    "q08_topk_per_group",
    """SELECT * FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
      |  FROM part
      |) WHERE rn <= 3
      |ORDER BY p_brand, rn""".stripMargin) { t =>
    TopK.perGroup(
      t.part.select(col("p_brand"), col("p_partkey"), col("p_retailprice")),
      Seq(col("p_brand")), Seq(col("p_retailprice").desc, col("p_partkey")), k = 3)
      .orderBy(col("p_brand"), col("rn"))
  }

  /** q09: ntile / percent_rank / cume_dist buckets per market segment
    * (ref: User Lifetime Value Prediction ranking block).
    */
  val q09 = Q.of(
    "q09_ntile_percent_rank",
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  ntile(4)       OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist()    OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin) { t =>
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
    t.customer
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
  }

  /** q10: exact percentiles per group (ref: 5× percentile_cont in the
    * reference SQL). Exact percentile is only safe per bounded group
    * (SURVEY §5); approx_percentile is the unbounded-cardinality path
    * (q25 shows the sketch pattern). Interpolated values are rounded to
    * 4 decimals on both engines since the interpolation arithmetic is
    * engine-internal.
    */
  val q10 = Q.of(
    "q10_percentile",
    """SELECT l_returnflag,
      |  round(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 4) AS qty_p25,
      |  round(CAST(quantile_cont(l_quantity, 0.50) AS DOUBLE), 4) AS qty_median,
      |  round(CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE), 4) AS qty_p75,
      |  round(CAST(quantile_cont(l_extendedprice, 0.50) AS DOUBLE), 4) AS price_median
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { t =>
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_quantity"), lit(0.25)), 4).as("qty_p25"),
        round(percentile(col("l_quantity"), lit(0.50)), 4).as("qty_median"),
        round(percentile(col("l_quantity"), lit(0.75)), 4).as("qty_p75"),
        round(percentile(col("l_extendedprice"), lit(0.50)), 4).as("price_median"))
      .orderBy(col("l_returnflag"))
  }

  /** q24: first/last order per customer via framed window + distinct
    * (ref: Subscription Upgrade-Downgrade first/last plan transitions).
    */
  val q24 = Q.of(
    "q24_first_last_value",
    """SELECT DISTINCT o_custkey,
      |  first_value(o_orderkey)   OVER w AS first_order,
      |  last_value(o_orderkey)    OVER w AS last_order,
      |  first_value(o_totalprice) OVER w AS first_price,
      |  last_value(o_totalprice)  OVER w AS last_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey""".stripMargin) { t =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.orders
      .select(
        col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"))
      .distinct()
      .orderBy(col("o_custkey"))
  }

  /** q28: RANGE frame — trailing-30-day spend per customer. The order
    * column is epoch-day (numeric) so the same RANGE semantics hold on
    * both engines; ties (same-day orders) are frame peers on both.
    */
  val q28 = Q.of(
    "q28_window_range_frame",
    """SELECT o_orderkey, o_custkey, day_no,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) OVER w AS DOUBLE) AS spend_30d,
      |  COUNT(*) OVER w AS n_orders_30d
      |FROM (SELECT *, date_diff('day', DATE '2020-01-01', CAST(o_orderdate AS DATE)) AS day_no FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin) { t =>
    val base = t.orders.withColumn("day_no",
      datediff(col("o_orderdate"), lit("2020-01-01").cast("date")).cast("long"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_no")).rangeBetween(-30, 0)
    base
      .select(col("o_orderkey"), col("o_custkey"), col("day_no"),
        sum(col("o_totalprice").cast(D20_6)).over(w).cast("double").as("spend_30d"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy(col("o_orderkey"))
  }

  /** q10b: approx_percentile — the sketch path for percentiles over
    * unbounded groups (SURVEY §5), closing the reference's
    * `percentile_approx` uses (/root/reference/pyspark/Infrastructure
    * Cost Optimization by Content Type.py, 2×). Mirrors q25's HLL
    * pattern: rows-only (sketch results are engine-specific), with the
    * error bound vs exact q10 percentiles asserted in OperatorsSpec.
    * accuracy=10000 ⇒ rank error ≤ n/10000 — at any scale the state is
    * O(accuracy), not O(group size).
    */
  val q10b = Q.rowsOnly("q10b_approx_percentile") { t =>
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_quantity"), lit(0.25), lit(10000)).as("qty_p25"),
        percentile_approx(col("l_quantity"), lit(0.50), lit(10000)).as("qty_median"),
        percentile_approx(col("l_quantity"), lit(0.75), lit(10000)).as("qty_p75"),
        percentile_approx(col("l_extendedprice"), lit(0.50), lit(10000)).as("price_median"))
      .orderBy(col("l_returnflag"))
  }

  def all: Seq[Q] = Seq(q06, q07, q08, q09, q10, q10b, q24, q28)
}
