package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** q197: FUNCTIONAL-DEPENDENCY violation audit — the profiling step
  * that validates assumed key→attribute invariants before a pipeline
  * leans on them (Deequ/uniqueness-check territory, public): an FD
  * A→B holds when every A value maps to exactly one B. q93 checks
  * row-level contracts and q180 cross-table FK orphans; this checks
  * WITHIN-table determinism claims — "orderkey determines custkey"
  * (a real key, must hold), "custkey determines priority" (false —
  * customers change priorities), and the violation inventory is what
  * tells a modeler which columns are safe to denormalize or join
  * through without fanout surprises.
  *
  * Per candidate FD: distinct LHS groups, groups with >1 distinct
  * RHS (violations), the worst group's RHS cardinality, and the
  * violation share ×10⁶ as an exact floor (token-identical double
  * floor both engines — the q196 cast rule).
  *
  * Scale shape: per FD one DISTINCT (lhs, rhs) projection folding to
  * per-lhs cardinalities then ONE row — map-side combined both
  * levels; the explicit distinct-pair frame (rather than per-group
  * count_distinct) keeps the aggregate Expand-free (the q106
  * lesson). Audits union to 4 rows total.
  */
object FdAudit {

  /** One-row violation audit of the FD `lhs → rhs`. Factored so the
    * spec can pin a holding FD (0 violations), a planted violation,
    * and the max-cardinality witness.
    */
  def fdAudit(df: DataFrame, lhs: Column, rhs: Column, label: String): DataFrame =
    df.select(lhs.as("graft_l"), rhs.as("graft_r"))
      .distinct()
      .groupBy(col("graft_l"))
      .agg(count(lit(1)).as("graft_nr"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("graft_nr") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("graft_nr")).as("max_rhs"))
      .select(
        lit(label).as("fd"),
        col("n_groups"), col("n_violating"), col("max_rhs"),
        floor(lit(1000000.0) * col("n_violating").cast("double") /
          col("n_groups").cast("double")).as("violation_ppm"))

  val q197 = Q.of(
    "q197_fd_audit",
    """WITH pairs AS (
      |  SELECT 'o_orderkey->o_custkey' AS fd, o_orderkey AS l,
      |    CAST(o_custkey AS VARCHAR) AS r FROM orders
      |  UNION ALL
      |  SELECT 'o_custkey->o_orderpriority', o_custkey, o_orderpriority
      |  FROM orders
      |  UNION ALL
      |  SELECT 'l_orderkey->l_returnflag', l_orderkey, l_returnflag
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'c_nationkey->c_mktsegment', c_nationkey, c_mktsegment
      |  FROM customer
      |), d AS (
      |  SELECT DISTINCT fd, l, r FROM pairs
      |), g AS (
      |  SELECT fd, l, COUNT(*) AS nr FROM d GROUP BY 1, 2
      |), folded AS (
      |  SELECT fd,
      |    CAST(COUNT(*) AS BIGINT) AS n_groups,
      |    CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_violating,
      |    CAST(MAX(nr) AS BIGINT) AS max_rhs
      |  FROM g GROUP BY 1
      |)
      |SELECT fd, n_groups, n_violating, max_rhs,
      |  CAST(FLOOR(1000000.0 * CAST(n_violating AS DOUBLE)
      |    / CAST(n_groups AS DOUBLE)) AS BIGINT) AS violation_ppm
      |FROM folded
      |ORDER BY fd""".stripMargin) { t =>
    fdAudit(t.orders, col("o_orderkey"),
        col("o_custkey").cast("string"), "o_orderkey->o_custkey")
      .unionAll(fdAudit(t.orders, col("o_custkey"),
        col("o_orderpriority"), "o_custkey->o_orderpriority"))
      .unionAll(fdAudit(t.lineitem, col("l_orderkey"),
        col("l_returnflag"), "l_orderkey->l_returnflag"))
      .unionAll(fdAudit(t.customer, col("c_nationkey"),
        col("c_mktsegment"), "c_nationkey->c_mktsegment"))
      .orderBy(col("fd"))
  }

  def all: Seq[Q] = Seq(q197)
}
