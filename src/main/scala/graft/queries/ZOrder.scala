package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det.dsum
import graft.sources.PartitionedStore

/** q98: the oracle-checked consumer of the Z-ORDERED layout
  * (`sources/PartitionedStore.writeZOrdered`) — the q92 maintenance
  * pattern applied to multi-dimensional clustering: lineitem is
  * rewritten z-ordered on (l_partkey, l_suppkey) with small row
  * groups, and the query answers a 2-D box predicate from the
  * REWRITTEN layout while the DuckDB oracle answers from the original
  * table — the gate proves the clustering rewrite preserved every row
  * and that both range predicates still reach the scan.
  *
  * Why this layout exists (100 TB): a fact sorted on ONE key gives
  * row-group stats that prune only that key's predicates; dashboards
  * filter on several dimensions at once, and the Morton interleave
  * makes row-group min/max selective on all clustered columns
  * simultaneously — SourcesSpec measures the actual row-group
  * skipping (scan output rows under the box: z-order ≪ 1-D sort).
  *
  * The box is RELATIVE to the key domains (top 10% of the partkey
  * span × 20% of the suppkey span, integer arithmetic both engines)
  * so it selects ~2% of rows at EVERY SF — a fixed absolute box
  * vanishes as domains grow with scale. The bounds are computed
  * driver-side from one footer-stats min/max pass (the q44
  * count-per-invocation class) and land in the plan as LITERALS, so
  * both range predicates still reach the scan as PushedFilters; the
  * oracle recomputes identical bounds via subqueries with `//`.
  */
object ZOrder {

  val q98 = Q.of(
    "q98_zorder_read",
    """WITH b AS (
      |  SELECT min(l_partkey) AS pmn,
      |         min(l_partkey) + (max(l_partkey) - min(l_partkey)) // 10 AS pmx,
      |         min(l_suppkey) AS smn,
      |         min(l_suppkey) + (max(l_suppkey) - min(l_suppkey)) // 5 AS smx
      |  FROM lineitem
      |)
      |SELECT l_returnflag,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_price
      |FROM lineitem, b
      |WHERE l_partkey BETWEEN pmn AND pmx AND l_suppkey BETWEEN smn AND smx
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { t =>
    val dir = s"/tmp/graft_q98_${t.dir.hashCode & 0x7fffffff}"
    PartitionedStore.writeZOrdered(
      t.lineitem.select("l_partkey", "l_suppkey", "l_returnflag",
        "l_quantity", "l_extendedprice"),
      dir, Seq("l_partkey", "l_suppkey"),
      files = 4, rowGroupBytes = 256L << 10)
    // box bounds as plan-time literals (one footer-stats pass) so the
    // range predicates reach the scan as PushedFilters
    val s = t.lineitem.agg(
      min("l_partkey").as("pmn"), max("l_partkey").as("pmx"),
      min("l_suppkey").as("smn"), max("l_suppkey").as("smx")).head()
    val (pmn, pmx) = (s.getAs[Long]("pmn"),
      s.getAs[Long]("pmn") + (s.getAs[Long]("pmx") - s.getAs[Long]("pmn")) / 10)
    val (smn, smx) = (s.getAs[Long]("smn"),
      s.getAs[Long]("smn") + (s.getAs[Long]("smx") - s.getAs[Long]("smn")) / 5)
    t.spark.read.parquet(dir)
      .filter(col("l_partkey").between(pmn, pmx) &&
        col("l_suppkey").between(smn, smx))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  def all: Seq[Q] = Seq(q98)
}
