package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.PrefixSum

/** q161: SEQUENCE-GAP audit — missing-ID range detection over the
  * orderkeys REFERENCED BY lineitem (the dense o_orderkey space minus
  * orders that shipped nothing — every hole below is a real absent-
  * key range): a CDC/replication completeness check (q94 applies
  * changes; THIS is how you notice a dropped batch — the sequence a
  * source system emits densely should arrive densely, and every hole
  * is a (start, end, width) incident row). The integer twin of q148's
  * date islands (and the q93 ledger's ordering-axis complement),
  * spelled as a successor lookup so each gap is found exactly once
  * with no spine join against the full ID range (a generated spine
  * would be max(id)-sized — at 100 TB that is the whole keyspace;
  * this only touches PRESENT ids).
  *
  * Scale shape: distinct ids in one map-side-combined exchange; the
  * successor comes from the distributed prefix rank plus a rank
  * self-join (range exchange + per-partition windows + one equi-join
  * — full parallelism, never the one-task global lead window). All
  * integers — hash-exact.
  */
object IdGaps {

  /** (gap_start, gap_end, missing) rows for every hole in the
    * distinct values of integral `idCol`, plus ordering metadata.
    * Factored so the spec can pin crafted hole patterns and the
    * no-gap empty result.
    */
  def gaps(df: DataFrame, idCol: String): DataFrame = {
    // successor via the distributed prefix rank + a rank self-join,
    // NOT lead() over an empty-partition window: the distinct-id
    // frame is data-sized, and a global window would collapse it
    // into ONE task. rank is a total order on graft_id, so joining
    // rank r with rank r+1 IS lead(); the last id has no successor
    // row (inner join), exactly like lead()'s trailing NULL after
    // the gap filter.
    val ids = df.select(col(idCol).cast("long").as("graft_id")).distinct()
    val ranked = PrefixSum.orderedRunningSum(
      ids, orderBy = Seq(col("graft_id")), value = lit(1L),
      outCol = "graft_r", numPartitions = 8)
    val succ = ranked.select((col("graft_r") - 1).as("graft_r"),
      col("graft_id").as("graft_next"))
    ranked.join(succ, Seq("graft_r"))
      .filter(col("graft_next") > col("graft_id") + 1)
      .select(
        (col("graft_id") + 1).as("gap_start"),
        (col("graft_next") - 1).as("gap_end"),
        (col("graft_next") - col("graft_id") - 1).as("missing"))
  }

  val q161 = Q.of(
    "q161_id_gap_audit",
    """WITH ids AS (
      |  SELECT DISTINCT l_orderkey AS id FROM lineitem
      |), nxt AS (
      |  SELECT id, lead(id, 1) OVER (ORDER BY id) AS next_id FROM ids
      |)
      |SELECT id + 1 AS gap_start,
      |  next_id - 1 AS gap_end,
      |  CAST(next_id - id - 1 AS BIGINT) AS missing
      |FROM nxt
      |WHERE next_id > id + 1
      |ORDER BY gap_start""".stripMargin) { t =>
    gaps(t.lineitem, "l_orderkey").orderBy(col("gap_start"))
  }

  def all: Seq[Q] = Seq(q161)
}
