package graft

import org.apache.spark.sql.functions._
import graft.sources.PartitionedStore

/** The partitioned layout must actually prune: an equality predicate
  * on the partition column has to land in the scan's PartitionFilters
  * (planning-time directory skipping), not just PushedFilters, and the
  * round-tripped data must be intact.
  */
class SourcesSpec extends SparkSpec {

  private val dir = java.nio.file.Files
    .createTempDirectory("graft_part").toString + "/events_by_type"

  test("partitioned write round-trips and prunes partitions at planning time") {
    val events = tables.events.select("event_id", "user_id", "ts", "event_type")
    PartitionedStore.writePartitioned(events, dir, Seq("event_type"))

    val back = PartitionedStore.readPartitioned(spark, dir)
    assert(back.count() == events.count(), "row count changed in round trip")

    val filtered = back.filter(col("event_type") === "purchase")
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters"), s"no PartitionFilters section:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"event_type predicate did not become a partition filter:\n$plan")
    assert(
      filtered.count() ==
        tables.events.filter(col("event_type") === "purchase").count(),
      "pruned read lost rows")
  }

  test("each partition directory holds coalesced files, not one shard per task") {
    val subdirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    assert(subdirs.nonEmpty, s"no hive-style partition dirs under $dir")
    for (d <- subdirs) {
      val parts = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts == 1,
        s"${d.getName}: $parts files — repartition-before-write not coalescing")
    }
  }
}
