package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.det._
import graft.Dims.dimBroadcast

/** Relational core (SURVEY.md §2 q01–q28), re-expressing the query
  * shapes of the reference's 20 analyses (multi-table star joins,
  * CASE segmentation, window analytics, rollup/cube/pivot, CTE
  * funnels — e.g. /root/reference/pyspark/Churn Prediction and Risk
  * Analysis.py:1-60) against the driver testdata schema.
  *
  * Every query ends in a total-order sort and uses the decimal-sum
  * determinism rules from [[graft.functions.det]] so the DuckDB oracle
  * hash-compare is exact (SURVEY.md §6).
  */
object Relational {

  /** q01: scan + filter + groupBy aggregate. The filter and the
    * 5-column projection must reach the parquet scan (PushedFilters /
    * pruned ReadSchema) — verified in RelationalSpec.
    */
  val q01 = Q.of(
    "q01_agg_pushdown",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(20,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { t =>
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        davg(col("l_discount")).as("avg_disc"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02: star join — fact never shuffles for dim joins; both dims are
    * broadcast (at 100 TB the fact side streams map-side through two
    * BroadcastHashJoins).
    */
  val q02 = Q.of(
    "q02_join_broadcast",
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items,
      |  COUNT(DISTINCT l_suppkey) AS n_suppliers
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { t =>
    t.lineitem
      .join(dimBroadcast(t.part), col("l_partkey") === col("p_partkey"))
      .join(dimBroadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"),
        countDistinct(col("l_suppkey")).as("n_suppliers"))
      .orderBy(col("p_brand"))
  }

  /** q03: 4-way join + countDistinct + conditional aggregate
    * (ref: Churn Prediction and Risk Analysis.py:13-21 shape).
    * orders/customer/nation are broadcast-able dims vs lineitem.
    */
  val q03 = Q.of(
    "q03_multi_join_agg",
    """SELECT n_name,
      |  COUNT(DISTINCT o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT'
      |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(20,6))) AS DOUBLE) AS urgent_revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { t =>
    val amt = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    t.lineitem
      .join(t.orders.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(dimBroadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(dimBroadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        dsum(amt).as("revenue"),
        dsum(when(col("o_orderpriority") === "1-URGENT", amt).otherwise(lit(0.0))).as("urgent_revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"))
  }

  /** q04: when/otherwise segmentation ladder (ref: every reference
    * script's `engagement_segment` / risk-bucket pattern).
    */
  val q04 = Q.of(
    "q04_case_segmentation",
    """SELECT c_mktsegment,
      |  CASE WHEN c_acctbal < 0 THEN 'negative'
      |       WHEN c_acctbal < 2000 THEN 'low'
      |       WHEN c_acctbal < 5000 THEN 'mid'
      |       WHEN c_acctbal < 8000 THEN 'high'
      |       ELSE 'premium' END AS segment,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) AS total_bal,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
      |FROM customer
      |GROUP BY 1, 2
      |ORDER BY c_mktsegment, segment""".stripMargin) { t =>
    t.customer
      .withColumn("segment",
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 2000, "low")
          .when(col("c_acctbal") < 5000, "mid")
          .when(col("c_acctbal") < 8000, "high")
          .otherwise("premium"))
      .groupBy(col("c_mktsegment"), col("segment"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("c_acctbal")).as("total_bal"),
        davg(col("c_acctbal")).as("avg_bal"))
      .orderBy(col("c_mktsegment"), col("segment"))
  }

  /** q05: ranking window functions over a unique composite order
    * (ref: Advanced Recommendation System Performance ranking block).
    */
  val q05 = Q.of(
    "q05_window_rank",
    """SELECT * FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER w AS rn,
      |    rank()       OVER w AS rnk,
      |    dense_rank() OVER w AS drnk
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
      |) WHERE rn <= 5
      |ORDER BY o_orderpriority, rn""".stripMargin) { t =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  def all: Seq[Q] = Seq(q01, q02, q03, q04, q05)
}
