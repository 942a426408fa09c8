package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det.dsum
import graft.sources.PartitionedStore

/** q92: the oracle-checked consumer of small-file COMPACTION
  * (`sources/PartitionedStore.compact`) — the q81 pattern applied to
  * table maintenance: a deliberately fragmented partitioned copy of
  * lineitem (13 files per partition directory, the one-file-per-task
  * shape streaming sinks and wide writers leave behind) is compacted
  * to its target file count, and the query then answers from the
  * COMPACTED layout while the DuckDB oracle answers from the original
  * table — so the gate proves the rewrite preserved every row and the
  * partition values encoded in the directory names.
  *
  * The filter on the partition column also rides through the
  * compacted layout as PLANNING-time pruning (the `N` directory's
  * files are never opened — pinned in SourcesSpec along with the
  * file-count collapse, data equality, healthy-partition no-op, and
  * idempotence).
  */
object Compaction {

  val q92 = Q.of(
    "q92_compacted_read",
    """SELECT l_returnflag,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE l_returnflag != 'N'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { t =>
    val dir = s"/tmp/graft_q92_${t.dir.hashCode & 0x7fffffff}"
    t.lineitem
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .repartition(13) // fragment: 13 part files per partition dir
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    PartitionedStore.compact(t.spark, dir) // default target => 1 file/dir here
    PartitionedStore.readPartitioned(t.spark, dir)
      .filter(col("l_returnflag") =!= "N")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  def all: Seq[Q] = Seq(q92)
}
