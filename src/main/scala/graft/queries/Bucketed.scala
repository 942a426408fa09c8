package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det.dsum
import graft.sources.PartitionedStore

/** q81: the oracle-checked consumer of the bucketed-table layout
  * (sources/PartitionedStore.writeBucketed — VERDICT r7 "next" #4).
  *
  * Shape: pay the layout shuffle ONCE at write time — lineitem and
  * orders are hash-bucketed (and per-bucket sorted) on the join key —
  * then run a fact⋈fact equi-join + per-key aggregate that rides the
  * bucket layout with ZERO exchanges (BucketedSpec pins the plan under
  * disabled auto-broadcast; the aggregate keys include the bucket key,
  * so even the groupBy needs no re-partitioning). At 100 TB this is
  * the nightly-refresh pattern: a fact⋈fact join is otherwise two
  * full-data exchanges per query, and the bucketed write amortizes
  * that across every downstream consumer of the layout.
  *
  * The write selects only the columns the layout's consumers need —
  * a real deployment would bucket the full fact once; here the narrow
  * write keeps the per-run cost proportional to the query.
  */
object Bucketed {

  /** Bucket count is a stable layout CONTRACT (joins only co-locate
    * across equal bucket counts) — sized for the target scale, small
    * here so sf0.001 still fills most buckets.
    */
  private val Buckets = 8

  val q81 = Q.of(
    "q81_bucketed_join",
    """SELECT o_orderkey, o_orderpriority,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY o_orderkey, o_orderpriority""".stripMargin) { t =>
    // per-sf table names: one session may touch several sf dirs (specs
    // vs verify); overwrite keeps re-runs idempotent either way
    val sfx  = (t.dir.hashCode & 0x7fffffff).toString
    val oTbl = s"graft_q81_orders_$sfx"
    val lTbl = s"graft_q81_lineitem_$sfx"
    PartitionedStore.writeBucketed(
      t.orders.select("o_orderkey", "o_orderpriority", "o_orderstatus"),
      oTbl, Buckets, Seq("o_orderkey"))
    PartitionedStore.writeBucketed(
      t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
      lTbl, Buckets, Seq("l_orderkey"))
    val o = PartitionedStore.readBucketed(t.spark, oTbl)
      .filter(col("o_orderstatus") === "F")
      .drop("o_orderstatus")
    val l = PartitionedStore.readBucketed(t.spark, lTbl)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  def all: Seq[Q] = Seq(q81)
}
