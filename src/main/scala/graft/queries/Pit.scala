package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det.dsum
import graft.operators.AsofJoin

/** q108: POINT-IN-TIME dimension lookup against the SCD2 history —
  * the consumption half of q86's merge and the join every warehouse
  * fact load runs: attach to each fact row the dimension VERSION that
  * was valid at the fact's event time (not today's row — the classic
  * time-travel-correctness bug is joining a fact to the current
  * dimension and leaking future attribute values into history).
  *
  * Implementation: the version chain is contiguous (q86 closes a row
  * at exactly the instant its successor opens), so "the version with
  * `valid_from <= t < valid_to`" IS "the latest version with
  * `valid_from <= t`" — a backward AS-OF join, executed by
  * [[AsofJoin.backward]]'s union-merge: fact and versions union'd,
  * ONE exchange on the business key, one sort, a running
  * `last(payload)` window. No join node, no row multiplication —
  * cost linear in |fact| + |history| no matter how deep a key's
  * version chain grows (the between-predicate join the oracle uses
  * would cross each fact row with its key's whole chain first).
  *
  * Facts dated before a key's first version legitimately find NO
  * version (the dimension didn't exist yet) and surface as a NULL
  * version group — counted, never dropped (LEFT-asof semantics; the
  * event spread is anchored at 2023-12-02 so a slice of every SF's
  * orders lands pre-history).
  *
  * The oracle reaches the same table through the q86 4-branch SCD2
  * SQL + an explicit validity-interval BETWEEN join — structurally
  * different on both the merge AND the lookup side of the compare.
  */
object Pit {

  /** Fact side: orders given a deterministic 2023-12-02..2024-11-30
    * event date spanning the dim's two version epochs plus a
    * pre-history window.
    */
  private def datedOrders(orders: DataFrame): DataFrame =
    orders.select(
      col("o_custkey"),
      col("o_totalprice"),
      date_add(lit("2023-12-02").cast("date"),
        (col("o_orderkey") % 365).cast("int")).as("evt_date"))

  val q108 = Q.of(
    "q108_pit_lookup",
    """WITH dim AS (
      |  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      |), upd AS (
      |  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 10 = 5
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 111.0, 'NEW'
      |  FROM customer WHERE c_custkey % 50 = 7
      |), j AS (
      |  SELECT d.c_custkey AS dk, d.c_acctbal AS da, d.c_mktsegment AS ds,
      |         u.c_custkey AS uk, u.c_acctbal AS ua, u.c_mktsegment AS us
      |  FROM dim d FULL OUTER JOIN upd u ON d.c_custkey = u.c_custkey
      |), scd AS (
      |  SELECT dk AS c_custkey, ds AS c_mktsegment,
      |         DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
      |         'current' AS row_status
      |  FROM j WHERE dk IS NOT NULL AND (uk IS NULL OR (ua = da AND us = ds))
      |  UNION ALL
      |  SELECT dk, ds, DATE '2024-01-01', DATE '2024-06-01', 'closed'
      |  FROM j WHERE dk IS NOT NULL AND uk IS NOT NULL AND (ua != da OR us != ds)
      |  UNION ALL
      |  SELECT dk, us, DATE '2024-06-01', CAST(NULL AS DATE), 'current'
      |  FROM j WHERE dk IS NOT NULL AND uk IS NOT NULL AND (ua != da OR us != ds)
      |  UNION ALL
      |  SELECT uk, us, DATE '2024-06-01', CAST(NULL AS DATE), 'current'
      |  FROM j WHERE dk IS NULL
      |), fact AS (
      |  SELECT o_custkey, o_totalprice,
      |    DATE '2023-12-02' + CAST(o_orderkey % 365 AS INT) AS evt_date
      |  FROM orders
      |)
      |SELECT COALESCE(s.c_mktsegment, 'NO_VERSION') AS segment,
      |  COALESCE(s.row_status, 'none') AS row_status,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(f.o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total
      |FROM fact f
      |LEFT JOIN scd s
      |  ON f.o_custkey = s.c_custkey
      | AND f.evt_date >= s.valid_from
      | AND (s.valid_to IS NULL OR f.evt_date < s.valid_to)
      |GROUP BY 1, 2
      |ORDER BY segment, row_status""".stripMargin) { t =>
    val dim = Scd2.mergedDim(t.customer)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"),
        col("valid_from"), col("row_status"))
    AsofJoin.backward(datedOrders(t.orders), dim,
      keyCol = "o_custkey", leftTimeCol = "evt_date", rightTimeCol = "valid_from")
      .groupBy(
        coalesce(col("c_mktsegment"), lit("NO_VERSION")).as("segment"),
        coalesce(col("row_status"), lit("none")).as("row_status"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("segment"), col("row_status"))
  }

  def all: Seq[Q] = Seq(q108)
}
