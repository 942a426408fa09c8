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

  test("compact collapses fragmented partitions, preserves data, no-ops when healthy") {
    import org.apache.hadoop.fs.Path
    val cdir = java.nio.file.Files
      .createTempDirectory("graft_compact").toString + "/events_frag"
    val events = tables.events.select("event_id", "user_id", "event_type")
    // fragment: one file per task, the shape a wide writer leaves
    events.repartition(17)
      .write.partitionBy("event_type").mode("overwrite").parquet(cdir)
    val fs = new Path(cdir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(sub: String) = fs.listStatus(new Path(cdir, sub))
      .count(_.getPath.getName.startsWith("part-"))
    assert(files("event_type=view") > 10, "fixture not fragmented?")

    val stats = PartitionedStore.compact(spark, cdir) // huge target => 1 file/dir
    assert(stats.nonEmpty, "compact reported no rewrites on a fragmented table")
    for ((d, (before, after)) <- stats) {
      assert(after == 1, s"$d compacted to $after files, want 1")
      assert(before > after, s"$d rewritten without gain")
    }
    assert(files("event_type=view") == 1)

    // data intact: same rows as the source, partition values included
    val back = PartitionedStore.readPartitioned(spark, cdir)
    assert(back.count() == events.count())
    val a = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = back.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, s"per-partition counts drifted: $a vs $b")

    // pruning still works over the compacted layout
    val plan = back.filter(col("event_type") === "purchase")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"compacted layout lost planning-time pruning:\n$plan")

    // idempotent: a second pass finds nothing to do
    assert(PartitionedStore.compact(spark, cdir).isEmpty,
      "second compact pass rewrote already-healthy partitions")
  }

  test("compact leaves healthy partitions untouched (targeted rewrite)") {
    import org.apache.hadoop.fs.Path
    val cdir = java.nio.file.Files
      .createTempDirectory("graft_compact2").toString + "/mixed"
    val docs = tables.documents.select("doc_id", "lang", "source")
    // source=src0 fragmented, the rest written healthy (1 file each)
    docs.filter(col("source") === "src0").repartition(9)
      .write.partitionBy("source").mode("overwrite").parquet(cdir)
    docs.filter(col("source") =!= "src0").repartition(col("source"))
      .write.partitionBy("source").mode("append").parquet(cdir)
    val fs = new Path(cdir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtimes(sub: String) = fs.listStatus(new Path(cdir, sub))
      .filter(_.getPath.getName.startsWith("part-"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val healthyBefore = mtimes("source=src1")
    val stats = PartitionedStore.compact(spark, cdir)
    assert(stats.keys.forall(_.contains("source=src0")),
      s"compact touched healthy partitions: ${stats.keys}")
    assert(mtimes("source=src1") == healthyBefore,
      "healthy partition files were rewritten")
    assert(PartitionedStore.readPartitioned(spark, cdir).count() == docs.count())
  }

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

  import graft.sources.TextIngest

  test("jsonl ingest round-trips documents and quarantines corrupt lines") {
    val docs = tables.documents.select("doc_id", "text", "lang", "source", "n_chars")
    val jdir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/docs"
    docs.select(to_json(struct(docs.columns.map(col): _*)).as("value"))
      .write.text(jdir)
    // inject corrupt lines: truncated json, bare text, and an empty
    // object is VALID json (parses to an all-null row, not quarantine)
    val corrupt = Seq("""{"doc_id": 1, "text": "unclosed""", "not json at all")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(jdir, "part-corrupt.txt"),
      corrupt.mkString("\n").getBytes("UTF-8"))

    val parsed = TextIngest.readJsonl(spark, jdir, docs.schema)
    val (good, bad) = TextIngest.split(parsed)
    assert(bad.collect().map(_.getString(0)).sorted.toSeq == corrupt.sorted,
      "quarantine must hold exactly the injected raw lines")
    assert(good.count() == docs.count(), "good-row count changed in round trip")
    // field-exact: same doc_id/text multiset back
    assert(good.select("doc_id", "text").exceptAll(docs.select("doc_id", "text")).isEmpty &&
      docs.select("doc_id", "text").exceptAll(good.select("doc_id", "text")).isEmpty,
      "jsonl round-trip altered rows")
  }

  test("gzipped jsonl decodes transparently, corrupt lines still quarantined") {
    val docs = tables.documents.select("doc_id", "text", "lang", "source", "n_chars")
    val gdir = java.nio.file.Files.createTempDirectory("graft_jsonl_gz").toString + "/docs"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(gdir))
    val lines = docs.select(to_json(struct(docs.columns.map(col): _*)).as("v"))
      .collect().map(_.getString(0))
    // two gzip shards + one corrupt line inside the second, like a
    // truncated crawl shard re-compressed mid-record
    val (shard1, shard2) = lines.splitAt(lines.length / 2)
    def writeGz(name: String, ls: Seq[String]): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(gdir, name)))
      out.write(ls.mkString("\n").getBytes("UTF-8")); out.close()
    }
    writeGz("shard-0.jsonl.gz", shard1.toSeq)
    writeGz("shard-1.jsonl.gz", shard2.toSeq :+ """{"doc_id": 99, "text": "chopped""")
    val (good, bad) = TextIngest.split(TextIngest.readJsonl(spark, gdir, docs.schema))
    assert(good.count() == docs.count(), "gz round-trip lost or invented rows")
    assert(bad.collect().map(_.getString(0)).toSeq ==
      Seq("""{"doc_id": 99, "text": "chopped"""),
      "corrupt line inside a gz shard must be quarantined")
  }

  test("splitToStore: one-pass landing, conformity flag prunes at planning time") {
    val docs = tables.documents.select("doc_id", "text", "lang", "source", "n_chars")
    val jdir = java.nio.file.Files.createTempDirectory("graft_jsonl2").toString + "/in"
    docs.select(to_json(struct(docs.columns.map(col): _*)).as("v")).write.text(jdir)
    java.nio.file.Files.write(java.nio.file.Paths.get(jdir, "part-bad.txt"),
      "definitely not json".getBytes("UTF-8"))
    val out = java.nio.file.Files.createTempDirectory("graft_landed").toString + "/docs"
    TextIngest.splitToStore(TextIngest.readJsonl(spark, jdir, docs.schema), out)
    val landed = PartitionedStore.readPartitioned(spark, out)
    val good = landed.filter(col("graft_is_corrupt") === false)
    val plan = good.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*graft_is_corrupt".r.findFirstIn(plan).isDefined,
      s"conformity flag not a partition filter:\n$plan")
    assert(good.count() == docs.count())
    assert(landed.filter(col("graft_is_corrupt") === true)
      .select(TextIngest.QuarantineCol).collect().map(_.getString(0)).toSeq ==
      Seq("definitely not json"))
  }

  test("bucketed tables join and aggregate on the bucket key with zero exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val abcast = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val oldB = spark.conf.getOption(bcast)
    val oldA = spark.conf.getOption(abcast)
    // force a non-broadcast join so the plan exercises the bucket layout
    spark.conf.set(bcast, "-1")
    spark.conf.set(abcast, "-1")
    try {
      val orders = tables.orders.select("o_orderkey", "o_custkey", "o_totalprice")
      val items = tables.lineitem.select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      PartitionedStore.writeBucketed(orders, "graft_b_orders", 4, Seq("o_orderkey"))
      PartitionedStore.writeBucketed(items, "graft_b_items", 4, Seq("o_orderkey"))
      val a = PartitionedStore.readBucketed(spark, "graft_b_orders")
      val b = PartitionedStore.readBucketed(spark, "graft_b_items")
      val joined = a.join(b, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("qty"), first("o_totalprice").as("price"))
      val got = joined.count()
      val expect = orders.join(items, "o_orderkey").select("o_orderkey").distinct().count()
      assert(got == expect, "bucketed join changed the result")
      // the whole join + aggregate rides the bucket layout: no exchange
      // anywhere (count() first so AQE has finalized the plan)
      val ex = physicalNodes(joined).collect { case s: ShuffleExchangeExec => s }
      assert(ex.isEmpty,
        s"bucketed join/aggregate planned ${ex.size} exchange(s):\n${planOf(joined)}")
      // layout contract: one file per bucket (repartition-before-write
      // aligns task hash with bucket hash), so bucket sort survives
      val loc = spark.sql("DESCRIBE TABLE EXTENDED graft_b_orders")
        .filter(col("col_name") === "Location").select("data_type").head.getString(0)
      // <= rather than ==: an empty bucket writes no file, so the
      // exact count is sensitive to which keys the driver's testdata
      // regeneration hashes into each bucket (ADVICE r7). The layout
      // claim — at MOST one file per bucket, never task-count shards —
      // is what repartition-before-write guarantees.
      val files = new java.io.File(new java.net.URI(loc)).listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files <= 4, s"expected at most one file per bucket, found $files")
    } finally {
      oldB.fold(spark.conf.unset(bcast))(spark.conf.set(bcast, _))
      oldA.fold(spark.conf.unset(abcast))(spark.conf.set(abcast, _))
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_items")
    }
  }

  test("csv ingest quarantines malformed rows instead of dropping or failing") {
    val cdir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/docs"
    val rows = Seq("1,alpha,10", "2,beta,20", "3,gamma,not_a_number", "4,delta")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cdir))
    java.nio.file.Files.write(java.nio.file.Paths.get(cdir, "part-0.csv"),
      rows.mkString("\n").getBytes("UTF-8"))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("name", org.apache.spark.sql.types.StringType)
      .add("n", org.apache.spark.sql.types.LongType)
    val (good, bad) = TextIngest.split(TextIngest.readCsv(spark, cdir, schema))
    // row 3 (type mismatch) AND row 4 (missing trailing column) are
    // both malformed to a schema-explicit CSV read: PERMISSIVE
    // null-fills what it can but still records the raw line, so the
    // quarantine is a complete ledger of every non-conforming input
    assert(bad.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("3,gamma,not_a_number", "4,delta"),
      "malformed lines must be quarantined verbatim")
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "only fully-conforming rows belong in good")
  }

  test("snapshot publish is all-or-nothing across partitions (interrupted publish invisible)") {
    // VERDICT r10 next #7: writeBatch/compact are per-leaf-dir atomic
    // only; the snapshot layout must give readers a consistent
    // multi-partition view across an INTERRUPTED publish.
    val sdir = java.nio.file.Files
      .createTempDirectory("graft_snap").toString + "/store"
    val v1 = tables.events
      .select("event_id", "user_id", "ts", "event_type")
      .filter(col("event_id") % 2 === 0)
    val id1 = PartitionedStore.publishSnapshot(v1, sdir, Seq("event_type"))
    assert(id1 == 1L)
    val seen1 = PartitionedStore.readSnapshot(spark, sdir)
    val n1 = seen1.count()
    assert(n1 == v1.count() && n1 > 0)

    // interrupted publish: v2 stages a DIFFERENT multi-partition tree
    // (more rows, every partition touched) but the publisher "dies"
    // before commit — a reader must still resolve v1, whole
    val v2 = tables.events.select("event_id", "user_id", "ts", "event_type")
    val id2 = PartitionedStore.stageSnapshot(v2, sdir, Seq("event_type"))
    assert(id2 == 2L)
    assert(PartitionedStore.currentSnapshot(spark, sdir).contains(1L),
      "staging moved the live pointer")
    val during = PartitionedStore.readSnapshot(spark, sdir)
    assert(during.count() == n1,
      "reader saw rows from the uncommitted snapshot")
    assert(during.filter(col("event_id") % 2 =!= 0).isEmpty,
      "reader saw an uncommitted row — the publish leaked mid-flight")

    // commit is one atomic pointer swap: the new tree appears whole
    PartitionedStore.commitSnapshot(spark, sdir, id2)
    assert(PartitionedStore.readSnapshot(spark, sdir).count() == v2.count())

    // partition pruning still works through the snapshot layout
    val pruned = PartitionedStore.readSnapshot(spark, sdir)
      .filter(col("event_type") === "purchase")
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"event_type predicate did not prune through the snapshot layout:\n$plan")

    // a crashed stage is re-stageable (same id, overwritten) and
    // vacuum drops superseded snapshots beyond the keep window
    val id3 = PartitionedStore.stageSnapshot(v1, sdir, Seq("event_type"))
    assert(id3 == 3L)
    val id3b = PartitionedStore.stageSnapshot(v1, sdir, Seq("event_type"))
    assert(id3b == 3L, "re-stage after a crash must reuse the uncommitted id")
    PartitionedStore.commitSnapshot(spark, sdir, id3b)
    // a pinned reader can still time-travel to the kept predecessor...
    assert(PartitionedStore.readSnapshotAt(spark, sdir, 2L).count() == v2.count())
    assert(PartitionedStore.vacuumSnapshots(spark, sdir, keep = 1) == Seq(1L))
    assert(PartitionedStore.readSnapshot(spark, sdir).count() == n1)
    // ...until vacuum drops it past the keep window
    intercept[IllegalStateException] {
      PartitionedStore.readSnapshotAt(spark, sdir, 1L)
    }
    assert(PartitionedStore.readSnapshotAt(spark, sdir, 2L).count() == v2.count())
  }

  test("watermark-committed append: uncommitted batches invisible, committed batches whole") {
    val adir = java.nio.file.Files
      .createTempDirectory("graft_append").toString + "/store"
    val e = tables.events.select("event_id", "user_id", "ts", "event_type")
    val b0 = e.filter(col("event_id") % 3 === 0)
    val b1 = e.filter(col("event_id") % 3 === 1)
    // batch 0 lands + commits; batch 1 lands but the writer "dies"
    // before the watermark moves — a reader must see exactly batch 0
    PartitionedStore.writeBatch(b0, adir, Seq("event_type"), 0L)
    PartitionedStore.commitBatchWatermark(spark, adir, 0L)
    PartitionedStore.writeBatch(b1, adir, Seq("event_type"), 1L)
    val seen = PartitionedStore.readCommitted(spark, adir)
    assert(seen.count() == b0.count(), "reader saw an uncommitted batch")
    assert(seen.filter(col("event_id") % 3 === 1).isEmpty)
    // the watermark filter prunes batch directories at PLANNING time
    val plan = seen.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*graft_batch_id".r.findFirstIn(plan).isDefined,
      s"watermark did not become a partition filter:\n$plan")
    // commit batch 1 -> both visible, whole
    PartitionedStore.commitBatchWatermark(spark, adir, 1L)
    assert(PartitionedStore.readCommitted(spark, adir).count()
      == b0.count() + b1.count())
  }

  test("z-order row-group skipping beats a 1-D sort on a 2-D box predicate") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // independent-ish dimensions over a controlled row count so the
    // row-group geometry (64 KiB groups) is deterministic enough to
    // measure skipping
    val df = spark.range(200000L).select(
      (col("id") % 447).as("x"), (col("id") % 997).as("y"), col("id").as("v"))
    val zdir = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString + "/z"
    val ldir = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString + "/linear"
    PartitionedStore.writeZOrdered(df, zdir, Seq("x", "y"),
      files = 2, rowGroupBytes = 64L << 10)
    // baseline with the SAME file count and row-group size, sorted on
    // the leading column only
    df.repartitionByRange(2, col("x")).sortWithinPartitions("x")
      .write.option("parquet.block.size", (64L << 10).toString)
      .mode("overwrite").parquet(ldir)

    def boxScan(path: String): (Seq[org.apache.spark.sql.Row], Long) = {
      val q = spark.read.parquet(path)
        .filter(col("x").between(0, 44) && col("y").between(0, 99))
        .orderBy("v")
      val rows = q.collect().toSeq
      val scanned = physicalNodes(q).collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.sum
      (rows, scanned)
    }

    val (zRows, zScanned) = boxScan(zdir)
    val (lRows, lScanned) = boxScan(ldir)
    val expect = df.filter(col("x").between(0, 44) && col("y").between(0, 99))
      .orderBy("v").collect().toSeq
    assert(zRows == expect, "z-ordered rewrite changed the data")
    assert(lRows == expect, "1-D-sorted rewrite changed the data")
    // the 1-D sort prunes on x only (~10% of rows decoded); the
    // z-order prunes on BOTH dimensions — require a clear win, not a
    // hair's width, so parquet writer drift can't flip the test
    assert(zScanned * 2 <= lScanned,
      s"z-order decoded $zScanned rows vs 1-D sort $lScanned — no skipping win")
    assert(zScanned < df.count(),
      "z-order scan decoded the whole table: row-group stats not selective")
  }
}
