package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{EventStreams, GraftEvent}

/** Streaming-path equivalence: the actual readStream → memory-sink
  * pipeline must produce the batch answer, and the stateful
  * sessionizer must agree with the declarative window-based q21.
  */
class StreamingSpec extends SparkSpec {

  test("q70: streaming hourlyCounts over file source equals batch result") {
    // events.parquet's ts physical type varies by testdata generation;
    // stream with the batch schema and apply the same normalization
    // Tables.events uses (see Tables.normalizeTs).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // FileStreamSource needs a directory; glob-filter to the events file
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .transform(Tables.normalizeTs)
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("q70mem")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("q70mem")
      .orderBy("hour", "event_type").collect().toSeq
    val batch = run("q70_stream_window_agg").collect().toSeq
    assert(streamed == batch,
      s"stream/batch mismatch: ${streamed.take(3)} vs ${batch.take(3)}")
  }

  test("q70 append mode emits exactly the watermark-closed windows") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .transform(Tables.normalizeTs)
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("q70append")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val emitted = spark.table("q70append").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val batch = run("q70_stream_window_agg")
    val maxTs = tables.events.agg(max(col("ts"))).head().getTimestamp(0)
    val all = batch.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // windows whose END is at or before (maxTs - 2h watermark) are closed;
    // the final no-data microbatch advances the watermark and flushes them
    val cutoffMs = maxTs.getTime - 2L * 3600 * 1000
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:00")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val closed = all.filter { case (hour, _) =>
      fmt.parse(hour).getTime + 3600 * 1000 <= cutoffMs
    }
    assert(emitted.subsetOf(all), "append emitted a window batch never produced")
    assert(closed.subsetOf(emitted),
      s"watermark-closed windows missing from append output: ${(closed -- emitted).take(5)}")
  }

  test("q71 stateful sessionization equals window-based q21") {
    val q71 = run("q71_stream_session")
      .select(col("user_id"), col("session_seq"), col("n_events"), col("duration_us"))
      .orderBy("user_id", "session_seq").collect().toSeq
    val q21 = run("q21_sessionize")
      .select(col("user_id"), col("session_seq"), col("n_events"), col("duration_us"))
      .orderBy("user_id", "session_seq").collect().toSeq
    assert(q71.size == q21.size, s"session counts differ: ${q71.size} vs ${q21.size}")
    assert(q71 == q21)
  }

  test("streaming sessionize (event-time timeout) emits every closed session") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .transform(Tables.normalizeTs)
    val q = EventStreams.sessionizeStream(stream, gapSeconds = 1800)
      .writeStream.format("memory").queryName("q71stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val emitted = spark.table("q71stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchRows = run("q71_stream_session").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lastSeq = batchRows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val closedInBatch = batchRows.filter { case (u, seq, _) => seq < lastSeq(u) }.toSet
    // one AvailableNow batch: every gap-closed session emits inline;
    // each user's open tail stays in state awaiting its event-time
    // timeout (a later batch), so it may or may not have emitted
    assert(closedInBatch.subsetOf(emitted),
      s"streaming path missed closed sessions: ${(closedInBatch -- emitted).take(5)}")
    assert(emitted.subsetOf(batchRows.toSet),
      s"streaming path emitted sessions batch never produced: ${(emitted -- batchRows.toSet).take(5)}")
  }

  test("q72: streaming dedup survivor set matches batch q40 per content hash") {
    val path = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      .withColumn("ts",
        timestamp_micros(col("doc_id") * 1000000L + lit(1704067200000000L)))
    val q = EventStreams.dedupByContent(stream, "text", "1 hour")
      .select(col("graft_content_hash"), col("doc_id"))
      .writeStream.format("memory").queryName("q72mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("q72mem").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // exactly one survivor per content hash
    assert(streamed.map(_._1).distinct.length == streamed.length,
      "stream emitted multiple survivors for one content hash")
    // same hash set as the batch q40 survivor set, and every streamed
    // survivor is a member of that hash's duplicate group
    val groups = tables.documents
      .select(md5(col("text")).as("h"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(streamed.map(_._1).toSet == groups.keySet,
      "streamed survivor hash set differs from batch distinct hashes")
    for ((h, id) <- streamed)
      assert(groups(h).contains(id), s"survivor $id not in group for hash $h")
  }

  test("sinkPartitioned: restart and batch replay never duplicate output") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    def drainOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
        .withColumn("ts",
          timestamp_micros(col("doc_id") * 1000000L + lit(1704067200000000L)))
      val survivors = EventStreams.dedupByContent(stream, "text", "1 hour")
        .select(col("doc_id"), col("source"), col("graft_content_hash"))
      val q = EventStreams.sinkPartitioned(survivors, out, Seq("source"), ckpt)
      q.awaitTermination(120000)
    }
    def stored(): Seq[Long] =
      spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    drainOnce()
    val first = stored()
    assert(first.nonEmpty && first.distinct.size == first.size)
    // clean restart on the same checkpoint: source is fully drained, so
    // a new AvailableNow run adds nothing
    drainOnce()
    assert(stored() == first, "restart on committed checkpoint duplicated rows")
    // crash-replay: wipe the checkpoint so batch 0 re-executes with the
    // SAME batch id against the existing store — the batchId guard must
    // replace, not append
    val ckptPath = new org.apache.hadoop.fs.Path(ckpt)
    ckptPath.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(ckptPath, true)
    drainOnce()
    assert(stored() == first, "replayed batch 0 duplicated its partition output")
  }

  test("sinkCommitted: every streamed row lands at or below the committed watermark") {
    import graft.sources.PartitionedStore
    val out = java.nio.file.Files.createTempDirectory("graft_wm_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_wm_ckpt").toString
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      .select(col("doc_id"), col("source"))
    val q = EventStreams.sinkCommitted(stream, out, Seq("source"), ckpt)
    q.awaitTermination(120000)
    // the drain committed its batches: the consistent read sees the
    // full corpus, and the watermark equals the highest landed batch
    val wm = PartitionedStore.batchWatermark(spark, out)
    assert(wm.nonEmpty, "no watermark committed after drain")
    val seen = PartitionedStore.readCommitted(spark, out)
    assert(seen.count() == tables.documents.count())
    // partition-value inference reads graft_batch_id back as INT
    val maxLanded = spark.read.parquet(out)
      .selectExpr("max(cast(graft_batch_id as bigint))").head.getLong(0)
    assert(wm.contains(maxLanded), s"watermark $wm behind landed $maxLanded")
  }

  test("q73: stream-static enrichment join over file source equals batch result") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .transform(Tables.normalizeTs)
    val q = EventStreams.enrichedSegmentCounts(stream, tables.customer)
      .writeStream.format("memory").queryName("q73mem")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("q73mem")
      .orderBy("segment", "event_type").collect().toSeq
    val batch = run("q73_stream_enrich").collect().toSeq
    assert(streamed == batch,
      s"stream/batch mismatch: ${streamed.take(3)} vs ${batch.take(3)}")
  }

  test("q90: streaming curation over file source equals batch result") {
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
    val q = EventStreams.curatedCounts(stream)
      .writeStream.format("memory").queryName("q90mem")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("q90mem")
      .orderBy("lang", "verdict").collect().toSeq
    val batch = run("q90_stream_curation").collect().toSeq
    assert(streamed == batch,
      s"stream/batch mismatch: ${streamed.take(3)} vs ${batch.take(3)}")
  }

  test("q76: stream-stream attribution self-join over file source equals batch") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    def eventsStream() = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .transform(Tables.normalizeTs)
    // one source, filtered twice: a genuine stream-stream SELF-join
    val src = eventsStream()
    val q = EventStreams.attributeWithin(
      src.filter(col("event_type") === "view"),
      src.filter(col("event_type") === "purchase"),
      maxDelaySeconds = 86400L)
      .writeStream.format("memory").queryName("q76mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getLong(2))
    val streamed = spark.table("q76mem").collect().map(key)
    val batch = run("q76_stream_attribution").collect().map(key)
    assert(streamed.length == streamed.toSet.size, "stream emitted duplicate pairs")
    assert(streamed.toSet == batch.toSet,
      s"stream/batch mismatch: extra=${(streamed.toSet -- batch.toSet).take(3)} " +
        s"missing=${(batch.toSet -- streamed.toSet).take(3)}")
  }

  test("q77: chained join+aggregate last-touch stream emits exactly the closed outcomes") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .transform(Tables.normalizeTs)
    val q = EventStreams.lastTouchWithin(
      src.filter(col("event_type") === "view"),
      src.filter(col("event_type") === "purchase"),
      maxDelaySeconds = 86400L)
      .writeStream.format("memory").queryName("q77mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val emitted = spark.table("q77mem").collect().map(key)
    val batch = run("q77_stream_last_touch").collect().map(key).toSet
    assert(emitted.length == emitted.toSet.size, "stream emitted an outcome twice")
    assert(emitted.toSet.subsetOf(batch),
      s"stream emitted rows batch never produced: ${(emitted.toSet -- batch).take(3)}")
    // the chained watermark is pessimistic by the join delay: windows
    // older than max(out_ts) - (join delay + watermark delay + 1h
    // window) must have finalized; newer outcomes may still be in state
    val maxOutUs = batch.map(_._5).max
    val horizonUs = maxOutUs - (86400L + 3600L + 3600L) * 1000000L
    val mustEmit = batch.filter(_._5 < horizonUs)
    assert(mustEmit.subsetOf(emitted.toSet),
      s"closed outcomes missing from append output: ${(mustEmit -- emitted.toSet).take(5)}")
  }

  test("q99: left-outer attribution stream reports zero-touch outcomes exactly once") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .transform(Tables.normalizeTs)
    val q = EventStreams.unattributedWithin(
      src.filter(col("event_type") === "view"),
      src.filter(col("event_type") === "purchase"),
      maxDelaySeconds = 86400L)
      .writeStream.format("memory").queryName("q99mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))
    val emitted = spark.table("q99mem").collect().map(key)
    val batchRows = run("q99_stream_unattributed").collect().map(key)
    val batch = batchRows.toSet
    assert(batchRows.exists(_._4 == 0L),
      "fixture must contain zero-touch outcomes or the outer join is untested")
    assert(emitted.length == emitted.toSet.size, "stream emitted an outcome twice")
    assert(emitted.toSet.subsetOf(batch),
      s"stream emitted rows batch never produced: ${(emitted.toSet -- batch).take(3)}")
    // same pessimistic horizon as q77: join delay + watermark + window
    val maxOutUs = batchRows.map(_._3).max
    val horizonUs = maxOutUs - (86400L + 3600L + 3600L) * 1000000L
    val mustEmit = batch.filter(_._3 < horizonUs)
    assert(mustEmit.subsetOf(emitted.toSet),
      s"closed outcomes missing from append output: ${(mustEmit -- emitted.toSet).take(5)}")
    // zero-touch rows themselves must be emittable through the outer
    // join: at least one closed outcome with n_touches == 0 appears
    if (mustEmit.exists(_._4 == 0L))
      assert(emitted.toSet.exists(_._4 == 0L),
        "no zero-touch outcome ever emitted — outer-join nulls not flowing")
  }

  test("attributeWithin boundary semantics: strict lower, inclusive upper, same user") {
    import spark.implicits._
    def frame(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("user_id", "event_id", "us")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val views = frame(Seq((1L, 10L, 0L), (2L, 11L, 0L)))
    val buys = frame(Seq(
      (1L, 20L, 0L),            // same instant -> excluded (strict >)
      (1L, 21L, 1000000L),      // +1s -> included
      (1L, 22L, 60L * 1000000L),  // exactly maxDelay -> included (inclusive)
      (1L, 23L, 61L * 1000000L),  // past maxDelay -> excluded
      (3L, 24L, 1000000L)))     // other user -> excluded
    val got = EventStreams.attributeWithin(views, buys, maxDelaySeconds = 60L)
      .select(col("imp_id"), col("out_id"), col("delay_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 21L, 1000000L), (10L, 22L, 60000000L)))
  }

  test("sessionize emits per-session rows with correct gap semantics") {
    import EventStreams._
    import spark.implicits._
    val evs = Seq(
      GraftEvent(1L, 1L, 0L),
      GraftEvent(1L, 2L, 1000000L),          // 1s later  -> same session
      GraftEvent(1L, 3L, 4000000000L),       // >30min    -> new session
      GraftEvent(2L, 4L, 0L))
    val out = EventStreams.sessionize(evs.toDS(), gapUs = 1800L * 1000000L)
      .collect().map(s => (s.user_id, s.session_seq, s.n_events)).toSet
    assert(out == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("q114: streaming near-dup flags match batch on watermark-closed windows") {
    // the chained stateful pipeline (stream-static banded join →
    // dropDuplicatesWithinWatermark → windowed aggregate) through the
    // real readStream path; append mode emits exactly the closed
    // windows, and every emission must match the batch oracle answer
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("ts",
        timestamp_micros(col("doc_id") * 60000000L + lit(1704067200000000L)))
      .select("doc_id", "text", "ts")
    val base = tables.documents
      .filter(pmod(col("doc_id"), lit(5)) =!= 0).select("doc_id", "text")
    val q = EventStreams.nearDupFlagged(stream, base)
      .writeStream.format("memory").queryName("q114mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("q114mem").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = run("q114_stream_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "fixture sanity: the corpus plants delta-vs-base near-dups")
    assert(streamed.subsetOf(batch),
      s"stream emitted rows the batch answer does not contain: ${(streamed -- batch).take(3)}")
    // in a CHAINED stateful pipeline the downstream aggregate sees the
    // upstream operator's watermark one microbatch late (Spark's
    // cross-operator watermark propagation), so the conservative
    // closed bound is TWO watermark delays behind max event time;
    // windows ending at or before that MUST have emitted
    val maxUs = 1704067200000000L +
      tables.documents.filter(pmod(col("doc_id"), lit(5)) === 0)
        .agg(max(col("doc_id"))).head().getLong(0) * 60000000L
    val closed = batch.filter { case (winStart, _, _) =>
      winStart + 3600000000L <= maxUs - 2L * 3600000000L }
    assert(closed.subsetOf(streamed),
      s"closed windows missing from the stream: ${(closed -- streamed).take(3)}")
    assert(streamed.nonEmpty, "no closed flagged windows at this fixture scale")
    spark.catalog.clearCache()
  }
}
