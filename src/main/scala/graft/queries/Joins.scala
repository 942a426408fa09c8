package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.det._
import graft.Dims.dimBroadcast
import graft.operators.{AsofJoin, RangeJoin, SkewJoin}

/** Join-shape queries (SURVEY.md §2 q15–q18, q22, q26).
  *
  * Re-expresses: EXISTS / NOT EXISTS gap analysis
  * (/root/reference/SQL/Content Catalog Gap Analysis.txt,
  * Real-time Personalization Effectiveness.txt:28,152 → left_semi /
  * left_anti, which never widen the probe side and need only the join
  * key from the build side), GROUP_CONCAT (7× in the reference, e.g.
  * /root/reference/SQL/Content Catalog Gap Analysis.txt:141 → sorted
  * collect_set + array_join), and share-of-total ratios
  * (/root/reference/SQL/Competitive Content Benchmarking.txt → cross
  * join with a broadcast single-row total).
  */
object Joins {

  /** q15: EXISTS → left_semi. The build side is reduced to the join
    * key before the exchange; output carries only probe columns.
    */
  val q15 = Q.of(
    "q15_semi_join",
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { t =>
    t.customer
      .join(t.orders.filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** q16: NOT EXISTS → left_anti — customers who never placed an
    * urgent order (ref: Content Catalog Gap Analysis "never watched"
    * blocks). The build-side filter is pushed into the parquet scan
    * before the anti join.
    */
  val q16 = Q.of(
    "q16_anti_join",
    """SELECT c_custkey, c_mktsegment, c_acctbal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { t =>
    t.customer
      .join(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** q17: UNION (distinct) of two key sets — high-balance customers ∪
    * customers with a big order. Spark's union is bag semantics; the
    * explicit distinct is the one shuffle.
    */
  val q17 = Q.of(
    "q17_union_distinct",
    """SELECT c_custkey FROM customer WHERE c_acctbal > 9000
      |UNION
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
      |ORDER BY c_custkey""".stripMargin) { t =>
    t.customer.filter(col("c_acctbal") > 9000).select(col("c_custkey"))
      .union(t.orders.filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey")))
      .distinct()
      .orderBy(col("c_custkey"))
  }

  /** q18: sorted group_concat — per nation, the ordered distinct set of
    * market segments present. collect_set is bounded by segment
    * cardinality (5), so the per-group state is tiny at any scale.
    */
  val q18 = Q.of(
    "q18_group_concat",
    """SELECT n_name,
      |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
      |  COUNT(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { t =>
    t.customer
      .join(dimBroadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  /** q22: share-of-total via cross join against a broadcast single-row
    * total — the grand total is one row, so the "cross join" is a
    * broadcast nested loop over one row, not a cartesian blow-up.
    */
  val q22 = Q.of(
    "q22_cross_join_ratio",
    """WITH tot AS (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total FROM orders
      |)
      |SELECT o_orderpriority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) / total AS share
      |FROM orders, tot
      |GROUP BY o_orderpriority, total
      |ORDER BY o_orderpriority""".stripMargin) { t =>
    val total = t.orders.agg(dsum(col("o_totalprice")).as("total"))
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
      .crossJoin(broadcast(total))
      .select(col("o_orderpriority"), col("revenue"),
        (col("revenue") / col("total")).as("share"))
      .orderBy(col("o_orderpriority"))
  }

  /** q29: LEFT OUTER join preserving the dim side + COALESCE zero-fill
    * + HAVING-style post-aggregate filter — the reference's single
    * most-used join shape (27 LEFT JOINs; e.g. /root/reference/SQL/
    * Content Catalog Gap Analysis.txt joins content ⟕ viewing_history/
    * watchlist to find never-watched titles, /root/reference/pyspark/
    * Content Catalog Gap Analysis.py:6-7 `.join(..., "left")`).
    *
    * Parts with few/no bulk (quantity ≥ 45) sales. Scale shape: the
    * fact is aggregated per partkey BEFORE the left join, so the join's
    * right side is one slim row per key and the preserved dim side is
    * never amplified — the aggregate-below-outer-join form of the gap
    * analysis. Null-producing aggregate columns are COALESCE'd to 0 and
    * never used as sort keys (§6(f)); the order key is the part PK.
    */
  val q29 = Q.of(
    "q29_left_outer_join",
    """SELECT p_partkey, p_brand,
      |  COUNT(l.l_partkey) AS n_bulk_lines,
      |  COALESCE(CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE), 0.0) AS bulk_qty,
      |  COALESCE(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE), 0.0) AS bulk_revenue
      |FROM part p LEFT JOIN lineitem l
      |  ON p.p_partkey = l.l_partkey AND l.l_quantity >= 45
      |GROUP BY p_partkey, p_brand
      |HAVING COUNT(l.l_partkey) <= 2
      |ORDER BY p_partkey""".stripMargin) { t =>
    val bulk = t.lineitem
      .filter(col("l_quantity") >= 45)
      .groupBy(col("l_partkey"))
      .agg(
        count(lit(1)).as("graft_n"),
        dsum(col("l_quantity")).as("graft_qty"),
        dsum(col("l_extendedprice")).as("graft_rev"))
    t.part
      .join(bulk, col("p_partkey") === col("l_partkey"), "left")
      .select(
        col("p_partkey"), col("p_brand"),
        coalesce(col("graft_n"), lit(0L)).as("n_bulk_lines"),
        coalesce(col("graft_qty"), lit(0.0)).as("bulk_qty"),
        coalesce(col("graft_rev"), lit(0.0)).as("bulk_revenue"))
      .filter(col("n_bulk_lines") <= 2)
      .orderBy(col("p_partkey"))
  }

  /** q26: salted skew join (SkewJoin operator) — the salted plan must
    * produce exactly the plain-join aggregate, which is what the DuckDB
    * oracle checks. SURVEY §5: salting spreads a hot key over numSalts
    * shuffle partitions; AQE skew-split is the complementary runtime
    * mechanism.
    */
  val q26 = Q.of(
    "q26_skew_salted_join",
    """SELECT o_orderpriority, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { t =>
    SkewJoin.salted(
      t.lineitem, t.orders.select(col("o_orderkey"), col("o_orderpriority")),
      "l_orderkey", "o_orderkey",
      saltSeed = Seq(col("l_orderkey"), col("l_linenumber")), numSalts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** q35: backward as-of join — each event paired with the customer's
    * most recent order at event time ([[AsofJoin.backward]]: the
    * union + running-last window merge, one exchange, no range-join
    * blow-up). Right-side (custkey, orderdate) ties are pre-deduped to
    * the max orderkey so the as-of target is unique and both engines
    * are deterministic; the oracle is DuckDB's native ASOF LEFT JOIN.
    */
  def q35For(asOf: graft.AsOf): Q = Q.of(
    "q35_asof_join",
    s"""WITH od AS (
      |  SELECT o_custkey AS user_id, o_orderdate AS last_orderdate,
      |    o_orderkey AS last_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey, o_orderdate
      |                       ORDER BY o_orderkey DESC) AS rn
      |  FROM orders WHERE o_orderdate <= ${asOf.sqlTs}
      |), odd AS (
      |  SELECT user_id, last_orderdate, last_orderkey FROM od WHERE rn = 1
      |)
      |SELECT e.event_id, e.user_id, e.ts, odd.last_orderdate, odd.last_orderkey,
      |  CAST(CAST(e.ts AS DATE) - CAST(odd.last_orderdate AS DATE) AS BIGINT) AS days_since_order
      |FROM (SELECT event_id, user_id, ts FROM events WHERE ts <= ${asOf.sqlTs}) e
      |ASOF LEFT JOIN odd
      |  ON e.user_id = odd.user_id AND odd.last_orderdate <= e.ts
      |ORDER BY e.event_id""".stripMargin) { t =>
    val dw = Window.partitionBy(col("user_id"), col("last_orderdate"))
      .orderBy(col("last_orderkey").desc)
    val od = t.orders
      .filter(col("o_orderdate") <= asOf.tsLit)
      .select(col("o_custkey").as("user_id"),
        col("o_orderdate").as("last_orderdate"),
        col("o_orderkey").as("last_orderkey"))
      .withColumn("graft_rn", row_number().over(dw))
      .filter(col("graft_rn") === 1)
      .drop("graft_rn")
    AsofJoin.backward(
      t.events.filter(col("ts") <= asOf.tsLit)
        .select(col("event_id"), col("user_id"), col("ts")),
      od, keyCol = "user_id", leftTimeCol = "ts", rightTimeCol = "last_orderdate")
      .withColumn("days_since_order",
        datediff(col("ts"), col("last_orderdate")).cast("long"))
      .orderBy(col("event_id"))
  }

  /** Pinned mid-stream: replay-at Jan 16 keeps ~half the events as the
    * as-of left side (the state side is naturally all-history).
    */
  val q35: Q = q35For(graft.AsOf("2024-01-16"))

  /** q36: interval range join — shipments landing inside any
    * high-value order's 7-day window ([[RangeJoin.pointInInterval]]:
    * bucketized equi-join + residual filter; a raw range-predicate
    * join would plan as a broadcast nested loop scanning
    * |lineitem|·|windows| pairs). Times are compared in epoch micros;
    * the bucket width equals the 7-day span so each window explodes
    * into ≤2 buckets. Oracle is the plain range-predicate join, which
    * DuckDB executes natively (IEJoin).
    */
  def q36For(asOf: graft.AsOf, lookbackDays: Int): Q = {
    val start = asOf.minusDays(lookbackDays)
    Q.of(
      "q36_range_join",
      s"""SELECT o.o_orderkey, o.o_orderdate AS window_start,
      |  COUNT(*) AS n_shipped_7d,
      |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS qty_shipped_7d
      |FROM lineitem l
      |JOIN (SELECT o_orderkey, o_orderdate FROM orders
      |      WHERE o_totalprice > 490000
      |        AND o_orderdate > ${start.sqlTs} AND o_orderdate <= ${asOf.sqlTs}) o
      |  ON l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
      |GROUP BY o.o_orderkey, o.o_orderdate
      |ORDER BY o.o_orderkey""".stripMargin) { t =>
    val weekUs = 7L * 86400L * 1000000L
    // parquet stores these as TIMESTAMP_NTZ; the session zone is UTC,
    // so the cast to instant is wall-clock-exact on both engines
    val odUs = unix_micros(col("o_orderdate").cast("timestamp"))
    val windows = t.orders
      .filter(col("o_totalprice") > 490000 &&
        col("o_orderdate") > start.tsLit && col("o_orderdate") <= asOf.tsLit)
      .select(col("o_orderkey"), col("o_orderdate").as("window_start"),
        odUs.as("w_start_us"), (odUs + weekUs - 1).as("w_end_us"))
    val ships = t.lineitem
      .select(unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"),
        col("l_quantity"))
    RangeJoin.pointInInterval(ships, "ship_us", windows, "w_start_us", "w_end_us",
      bucketWidth = weekUs)
      .groupBy(col("o_orderkey"), col("window_start"))
      .agg(count(lit(1)).as("n_shipped_7d"),
        dsum(col("l_quantity")).as("qty_shipped_7d"))
      .orderBy(col("o_orderkey"))
    }
  }

  /** Pinned: windows from orders placed 1999-01-01..2000-12-31 — the
    * asOf window cuts the interval set to ~a third of the data span.
    */
  val q36: Q = q36For(graft.AsOf("2000-12-31"), 730)

  def all: Seq[Q] = Seq(q15, q16, q17, q18, q22, q26, q29, q35, q36)
}
