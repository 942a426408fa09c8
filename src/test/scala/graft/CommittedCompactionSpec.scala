package graft

import org.apache.spark.sql.functions._

import graft.sources.PartitionedStore

/** The untested interleaving a real lakehouse hits daily (VERDICT r11
  * next #6): a reader iterating `readCommitted` WHILE a compaction
  * rewrites the same batches. `compactCommitted` is the
  * manifest-commit answer — generations are immutable once their
  * pointer commits, so every read resolves to a consistent
  * (generation, root-tail) pair no matter where the swap lands.
  */
class CommittedCompactionSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/store"

  private def events = tables.events
    .select(col("event_id"), col("event_type"), col("value"))

  /** (row count, id checksum) — the multiset fingerprint every read
    * must reproduce exactly.
    */
  private def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)).cast("long"),
      sum(col("event_id")).cast("long")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("readCommitted sees every committed batch exactly once DURING a concurrent compaction") {
    val dir = freshDir("graft_cc_race")
    (0L to 3L).foreach { b =>
      // fragment each batch so the compactions have real work
      PartitionedStore.writeBatch(
        events.filter(pmod(col("event_id"), lit(4)) === b).repartition(5),
        dir, Seq("event_type"), b)
      PartitionedStore.commitBatchWatermark(spark, dir, b)
    }
    val expect = fingerprint(PartitionedStore.readCommitted(spark, dir))
    assert(expect._1 > 0)

    // reader in a background thread, compactions on this one: the
    // reader loop spans the whole compaction window by construction,
    // so reads are guaranteed to race the pointer swaps
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var stop = false
    val reader = new Thread(() => {
      try while (!stop) {
        val got = fingerprint(PartitionedStore.readCommitted(spark, dir))
        if (got != expect)
          throw new AssertionError(
            s"read ${reads.get} during compaction saw $got, want $expect")
        reads.incrementAndGet()
      } catch { case e: Throwable => errs.add(e) }
    }, "graft-reader")
    reader.start()
    try (1 to 3).foreach { _ =>
      PartitionedStore.compactCommitted(spark, dir, Seq("event_type"))
    } finally { stop = true; reader.join() }
    assert(errs.isEmpty, s"reader failed mid-compaction: ${errs.peek()}")
    assert(reads.get > 0, "the reader never raced the compactor")
    // post-compaction read is still exact, and the generation is live
    assert(fingerprint(PartitionedStore.readCommitted(spark, dir)) == expect)
    val gen = PartitionedStore.compactionGeneration(spark, dir)
    assert(gen.exists(_._1 == 3L) && gen.exists(_._2 == 3L), s"pointer: $gen")
  }

  test("writer appends during/after compaction stay visible through the generation+root union") {
    val dir = freshDir("graft_cc_union")
    (0L to 1L).foreach { b =>
      PartitionedStore.writeBatch(
        events.filter(pmod(col("event_id"), lit(4)) === b),
        dir, Seq("event_type"), b)
      PartitionedStore.commitBatchWatermark(spark, dir, b)
    }
    PartitionedStore.compactCommitted(spark, dir, Seq("event_type"))
    // batches landing AFTER the compaction's covered watermark
    (2L to 3L).foreach { b =>
      PartitionedStore.writeBatch(
        events.filter(pmod(col("event_id"), lit(4)) === b),
        dir, Seq("event_type"), b)
      PartitionedStore.commitBatchWatermark(spark, dir, b)
    }
    val expect = fingerprint(events)
    assert(fingerprint(PartitionedStore.readCommitted(spark, dir)) == expect,
      "generation + root union lost or duplicated a batch")
    // a second compaction folds the tail into the next generation
    PartitionedStore.compactCommitted(spark, dir, Seq("event_type"))
    assert(fingerprint(PartitionedStore.readCommitted(spark, dir)) == expect)
    // vacuum drops the stale generation and the covered root trees;
    // the live read is untouched
    PartitionedStore.vacuumCommitted(spark, dir, keep = 0)
    assert(fingerprint(PartitionedStore.readCommitted(spark, dir)) == expect)
    val (root, fs) = {
      val pp = new org.apache.hadoop.fs.Path(dir)
      (pp, pp.getFileSystem(spark.sparkContext.hadoopConfiguration))
    }
    assert(!fs.listStatus(root).exists(
      _.getPath.getName.startsWith("graft_batch_id=")),
      "vacuum left covered root batch trees behind")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(root, ".graft_compacted"))
      .count(_.isDirectory) == 1, "vacuum left stale generations behind")
  }

  test("compaction collapses the fragmented leaves (one file per batch/partition leaf)") {
    val dir = freshDir("graft_cc_files")
    PartitionedStore.writeBatch(events.repartition(7), dir, Seq("event_type"), 0L)
    PartitionedStore.commitBatchWatermark(spark, dir, 0L)
    val g = PartitionedStore.compactCommitted(spark, dir, Seq("event_type"))
    val genRoot = new org.apache.hadoop.fs.Path(s"$dir/.graft_compacted/$g")
    val fs = genRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val entries = fs.listStatus(p).toSeq
      val dirs = entries.filter(_.isDirectory).map(_.getPath)
      if (dirs.isEmpty) Seq(p) else dirs.flatMap(leaves)
    }
    leaves(genRoot).foreach { leaf =>
      val n = fs.listStatus(leaf).count(_.getPath.getName.startsWith("part-"))
      assert(n == 1, s"$leaf holds $n files, want 1")
    }
  }
}
