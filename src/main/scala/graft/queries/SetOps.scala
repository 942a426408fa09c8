package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det.dsum

/** q104/q105: the two ANSI relational surfaces the registry did not
  * yet exercise as first-class entries — bag-free set operators
  * (INTERSECT / EXCEPT, the algebraic complement of q17's UNION
  * DISTINCT) and arbitrary GROUPING SETS (the general form of which
  * q12's ROLLUP and q13's CUBE are the two special cases).
  *
  * Reference: the gap analyses express membership via EXISTS / NOT
  * EXISTS (SQL/Content Catalog Gap Analysis.txt) — q15/q16 cover that
  * form; INTERSECT/EXCEPT is the set-algebra spelling a reference
  * user migrating ad-hoc SQL will reach for, and Catalyst plans it
  * through the same leftsemi/leftanti machinery.
  */
object SetOps {

  /** q104: INTERSECT / EXCEPT membership split of two derived key
    * sets — customers who placed an urgent order vs customers who
    * placed a high-priority order, reported as the three disjoint
    * regions of the Venn diagram (both / urgent-only / high-only).
    *
    * Scale shape: each branch is a distinct-projected fact scan;
    * Catalyst plans INTERSECT as a left-semi and EXCEPT as a
    * left-anti hash join over the aggregated key sets, so every
    * branch is one key-shuffle of ids only (the fact's payload never
    * moves) and AQE picks broadcast when a side is genuinely small.
    * Output is customer-grain — bounded by the dim, never the fact.
    */
  val q104 = Q.of(
    "q104_intersect_except",
    """WITH urgent AS (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |), high AS (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      |)
      |SELECT o_custkey, 'both' AS region FROM (
      |  SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM high)
      |UNION ALL
      |SELECT o_custkey, 'urgent_only' FROM (
      |  SELECT o_custkey FROM urgent EXCEPT SELECT o_custkey FROM high)
      |UNION ALL
      |SELECT o_custkey, 'high_only' FROM (
      |  SELECT o_custkey FROM high EXCEPT SELECT o_custkey FROM urgent)
      |ORDER BY region, o_custkey""".stripMargin) { t =>
    val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct()
    val high = t.orders.filter(col("o_orderpriority") === "2-HIGH")
      .select("o_custkey").distinct()
    urgent.intersect(high).withColumn("region", lit("both"))
      .unionAll(urgent.except(high).withColumn("region", lit("urgent_only")))
      .unionAll(high.except(urgent).withColumn("region", lit("high_only")))
      .orderBy(col("region"), col("o_custkey"))
  }

  /** q105: arbitrary GROUPING SETS — ((priority, status), (status),
    * ()) with `grouping_id` disambiguating a NULL group value from a
    * subtotal row. Deliberately NOT a rollup (no (priority) set) and
    * NOT a cube (missing one of the four), so only the general
    * operator expresses it; Spark plans one Expand + one aggregate
    * exchange — the same single-pass shape as q12/q13, never one scan
    * per set.
    *
    * `grouping_id()` bit order: Spark assigns the FIRST grouping
    * column the most significant bit; DuckDB's `grouping_id(a, b)`
    * does the same, so the ids agree cell-for-cell (0 = fully
    * grouped, 2 = priority rolled away, 3 = grand total).
    */
  val q105 = Q.of(
    "q105_grouping_sets",
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status,
      |  CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderstatus), ())
      |ORDER BY gid, priority, status""".stripMargin) { t =>
    t.orders
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderstatus")), Seq.empty),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("gid"), col("n"), col("total"))
      .orderBy(col("gid"), col("priority"), col("status"))
  }

  def all: Seq[Q] = Seq(q104, q105)
}
