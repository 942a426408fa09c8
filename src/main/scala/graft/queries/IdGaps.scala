package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q161: SEQUENCE-GAP audit — missing-ID range detection over the
  * orderkeys REFERENCED BY lineitem (the dense o_orderkey space minus
  * orders that shipped nothing — every hole below is a real absent-
  * key range): a CDC/replication completeness check (q94 applies
  * changes; THIS is how you notice a dropped batch — the sequence a
  * source system emits densely should arrive densely, and every hole
  * is a (start, end, width) incident row). The integer twin of q148's
  * date islands (and the q93 ledger's ordering-axis complement),
  * spelled with `lead` so each gap is found exactly once with no
  * spine join against the full ID range (a generated spine would be
  * max(id)-sized — at 100 TB that is the whole keyspace; the lead
  * spelling only touches PRESENT ids).
  *
  * Scale shape: distinct ids in one map-side-combined exchange; the
  * lead window is one global sort of the distinct-id frame (the
  * honest cost of a total-order audit; the per-shard swap partitions
  * by id-range bucket and stitches boundaries). All integers —
  * hash-exact.
  */
object IdGaps {

  /** (gap_start, gap_end, missing) rows for every hole in the
    * distinct values of integral `idCol`, plus ordering metadata.
    * Factored so the spec can pin crafted hole patterns and the
    * no-gap empty result.
    */
  def gaps(df: DataFrame, idCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("graft_id")).distinct()
    val w = Window.orderBy(col("graft_id"))
    ids
      .withColumn("graft_next", lead(col("graft_id"), 1).over(w))
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
