package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{EventStreams, GraftEvent}
import scala.util.Random

/** Fixed-seed random-epoch differential for the stateful streaming
  * tier: the same event set is fed through the streaming paths split
  * across RANDOM MemoryStream batches, and the emitted rows must
  * reproduce the batch answer. The single-AvailableNow fixture tests
  * in StreamingSpec pin one batch boundary; these sweep many, so
  * cross-batch GroupState carry, event-time timeouts, and
  * watermark-driven expiry all get exercised at arbitrary cut points.
  */
class StreamingDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("sessionizeStream over random batch splits equals batch sessionize (3 seeds)") {
    for (seed <- Seq(121, 122, 123)) {
      val rnd = new Random(seed)
      val gapSeconds = 1800L
      val hourUs = 3600L * 1000000L
      // 4 users, ~40 events each on a 10-minute grid over ~3 days:
      // plenty of >30min gaps -> many sessions per user. The grid
      // starts a day after the epoch: Spark's initial watermark is 0,
      // and a row with ts <= watermark is filtered as late — an event
      // at exactly epoch 0 would be dropped by any watermarked
      // operator (found by this sweep's first run)
      var id = 0L
      val events = (for {
        u <- 1L to 4L
        _ <- 1 to 40
      } yield {
        id += 1
        GraftEvent(u, id,
          (24 * 6 + rnd.nextInt(3 * 24 * 6)).toLong * 600L * 1000000L)
      }).sortBy(e => (e.ts_us, e.event_id))
      // one far-future flush event per user so every REAL session is
      // closed by an in-stream gap, never left waiting in state
      val flushUs = events.map(_.ts_us).max + 10L * 24L * hourUs
      val flush = (1L to 4L).map { u => id += 1; GraftEvent(u, id, flushUs) }

      val batchExpect = EventStreams.sessionize(events.toDS(), gapSeconds * 1000000L)
        .collect().map(s => (s.user_id, s.session_seq, s.n_events, s.start_us, s.end_us)).toSet

      val input = MemoryStream[GraftEvent](spark)
      val stream = input.toDF()
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select(col("user_id"), col("event_id"), col("ts"))
      val q = EventStreams.sessionizeStream(stream, gapSeconds, watermarkDelay = "1 minute")
        .writeStream.format("memory").queryName(s"sessdiff$seed")
        .outputMode("append").start()
      try {
        // random cut points over the time-ordered feed; watermark only
        // moves forward, so in-order feeding keeps stream gaps ≡ batch
        // gaps (see scaladoc: late-beyond-watermark data is a semantic
        // change, not a differential case)
        var rest = events ++ flush
        while (rest.nonEmpty) {
          val take = 1 + rnd.nextInt(40)
          val (batch, tail) = rest.splitAt(take)
          input.addData(batch)
          q.processAllAvailable()
          rest = tail
        }
      } finally q.stop()
      val emitted = spark.table(s"sessdiff$seed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // every real session closed by the flush gap; only the four
      // flush singletons stay open in state
      assert(emitted.size == emitted.toSet.size, s"duplicate emissions at seed $seed")
      assert(emitted.toSet == batchExpect,
        s"stream/batch mismatch at seed $seed: extra=${emitted.toSet -- batchExpect} " +
          s"missing=${batchExpect -- emitted.toSet}")
    }
  }

  test("attributeWithin over random two-stream batch splits equals batch join (3 seeds)") {
    for (seed <- Seq(131, 132, 133)) {
      val rnd = new Random(seed)
      val dayUs = 24L * 3600L * 1000000L
      // 4 users × 30 views + 30 purchases on a 10-min grid over ~2
      // days (starting a day after the epoch — see the sessionize
      // sweep's watermark-0 note), 3h attribution window → a dense
      // mix of matched, boundary, and unmatched events
      var id = 0L
      def gen(): Seq[GraftEvent] = (for {
        u <- 1L to 4L
        _ <- 1 to 30
      } yield {
        id += 1
        GraftEvent(u, id, dayUs + rnd.nextInt(2 * 24 * 6).toLong * 600L * 1000000L)
      }).sortBy(e => (e.ts_us, e.event_id))
      val views = gen()
      val buys = gen()

      def toFrame(evs: Seq[GraftEvent]) = evs.toDF()
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select(col("user_id"), col("event_id"), col("ts"))
      val expect = EventStreams.attributeWithin(
        toFrame(views), toFrame(buys), maxDelaySeconds = 3L * 3600L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      val vIn = MemoryStream[GraftEvent](spark)
      val bIn = MemoryStream[GraftEvent](spark)
      def stream(in: MemoryStream[GraftEvent]) = in.toDF()
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select(col("user_id"), col("event_id"), col("ts"))
      val q = EventStreams.attributeWithin(
        stream(vIn), stream(bIn), maxDelaySeconds = 3L * 3600L,
        impWatermarkDelay = "1 minute", outWatermarkDelay = "1 minute")
        .writeStream.format("memory").queryName(s"attrdiff$seed")
        .outputMode("append").start()
      try {
        // each stream fed in its own event-time order (late-beyond-
        // watermark is a semantic change, not a differential case) but
        // cut and interleaved at random — the global watermark is the
        // min across inputs, so uneven progress must never evict a
        // still-matchable row
        var restV = views
        var restB = buys
        while (restV.nonEmpty || restB.nonEmpty) {
          if (restV.nonEmpty && (restB.isEmpty || rnd.nextBoolean())) {
            val (batch, tail) = restV.splitAt(1 + rnd.nextInt(25))
            vIn.addData(batch); restV = tail
          } else {
            val (batch, tail) = restB.splitAt(1 + rnd.nextInt(25))
            bIn.addData(batch); restB = tail
          }
          q.processAllAvailable()
        }
      } finally q.stop()
      val emitted = spark.table(s"attrdiff$seed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(emitted.length == emitted.toSet.size, s"duplicate pairs at seed $seed")
      assert(emitted.toSet == expect,
        s"stream/batch mismatch at seed $seed: extra=${(emitted.toSet -- expect).take(5)} " +
          s"missing=${(expect -- emitted.toSet).take(5)}")
    }
  }

  test("lastTouchWithin over random two-stream batch splits equals batch argmax (3 seeds)") {
    for (seed <- Seq(141, 142, 143)) {
      val rnd = new Random(seed)
      val dayUs = 24L * 3600L * 1000000L
      var id = 0L
      def gen(n: Int): Seq[GraftEvent] = (for {
        u <- 1L to 4L
        _ <- 1 to n
      } yield {
        id += 1
        GraftEvent(u, id, dayUs + rnd.nextInt(2 * 24 * 6).toLong * 600L * 1000000L)
      }).sortBy(e => (e.ts_us, e.event_id))
      val views = gen(30)
      val buys = gen(30)
      // far-future flush on BOTH streams pushes the chained watermark
      // (pessimistic by the join delay) past every real outcome's
      // window; flush-epoch outcomes themselves stay in state and are
      // excluded from the compare on both sides
      val flushUs = dayUs * 40
      val flushV = (1L to 4L).map { u => id += 1; GraftEvent(u, id, flushUs) }
      val flushB = (1L to 4L).map { u => id += 1; GraftEvent(u, id, flushUs) }

      def toFrame(evs: Seq[GraftEvent]) = evs.toDF()
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select(col("user_id"), col("event_id"), col("ts"))
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val expect = EventStreams.lastTouchWithin(
        toFrame(views ++ flushV), toFrame(buys ++ flushB), maxDelaySeconds = 3L * 3600L)
        .collect().map(key).filter(_._5 < flushUs).toSet

      val vIn = MemoryStream[GraftEvent](spark)
      val bIn = MemoryStream[GraftEvent](spark)
      def stream(in: MemoryStream[GraftEvent]) = in.toDF()
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select(col("user_id"), col("event_id"), col("ts"))
      val q = EventStreams.lastTouchWithin(
        stream(vIn), stream(bIn), maxDelaySeconds = 3L * 3600L,
        impWatermarkDelay = "1 minute", outWatermarkDelay = "1 minute")
        .writeStream.format("memory").queryName(s"ltdiff$seed")
        .outputMode("append").start()
      try {
        var restV = views ++ flushV
        var restB = buys ++ flushB
        while (restV.nonEmpty || restB.nonEmpty) {
          if (restV.nonEmpty && (restB.isEmpty || rnd.nextBoolean())) {
            val (batch, tail) = restV.splitAt(1 + rnd.nextInt(25))
            vIn.addData(batch); restV = tail
          } else {
            val (batch, tail) = restB.splitAt(1 + rnd.nextInt(25))
            bIn.addData(batch); restB = tail
          }
          q.processAllAvailable()
        }
      } finally q.stop()
      val emitted = spark.table(s"ltdiff$seed").collect().map(key).filter(_._5 < flushUs)
      assert(emitted.length == emitted.toSet.size, s"outcome emitted twice at seed $seed")
      assert(emitted.toSet == expect,
        s"stream/batch mismatch at seed $seed: extra=${(emitted.toSet -- expect).take(5)} " +
          s"missing=${(expect -- emitted.toSet).take(5)}")
    }
  }

  test("unattributedWithin over random two-stream splits equals batch left-outer (3 seeds)") {
    for (seed <- Seq(151, 152, 153)) {
      val rnd = new Random(seed)
      val dayUs = 24L * 3600L * 1000000L
      var id = 0L
      def gen(n: Int): Seq[GraftEvent] = (for {
        u <- 1L to 4L
        _ <- 1 to n
      } yield {
        id += 1
        GraftEvent(u, id, dayUs + rnd.nextInt(2 * 24 * 6).toLong * 600L * 1000000L)
      }).sortBy(e => (e.ts_us, e.event_id))
      // sparse views so a material fraction of outcomes has ZERO
      // qualifying impressions — the rows only the outer join reports
      val views = gen(4)
      val buys = gen(30)
      val flushUs = dayUs * 40
      val flushV = (1L to 4L).map { u => id += 1; GraftEvent(u, id, flushUs) }
      val flushB = (1L to 4L).map { u => id += 1; GraftEvent(u, id, flushUs) }

      def toFrame(evs: Seq[GraftEvent]) = evs.toDF()
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select(col("user_id"), col("event_id"), col("ts"))
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))
      val expect = EventStreams.unattributedWithin(
        toFrame(views ++ flushV), toFrame(buys ++ flushB), maxDelaySeconds = 3L * 3600L)
        .collect().map(key).filter(_._3 < flushUs).toSet
      assert(expect.exists(_._4 == 0L),
        s"seed $seed fixture produced no zero-touch outcome — weaken views further")

      val vIn = MemoryStream[GraftEvent](spark)
      val bIn = MemoryStream[GraftEvent](spark)
      def stream(in: MemoryStream[GraftEvent]) = in.toDF()
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select(col("user_id"), col("event_id"), col("ts"))
      val q = EventStreams.unattributedWithin(
        stream(vIn), stream(bIn), maxDelaySeconds = 3L * 3600L,
        impWatermarkDelay = "1 minute", outWatermarkDelay = "1 minute")
        .writeStream.format("memory").queryName(s"uadiff$seed")
        .outputMode("append").start()
      try {
        var restV = views ++ flushV
        var restB = buys ++ flushB
        while (restV.nonEmpty || restB.nonEmpty) {
          if (restV.nonEmpty && (restB.isEmpty || rnd.nextBoolean())) {
            val (batch, tail) = restV.splitAt(1 + rnd.nextInt(25))
            vIn.addData(batch); restV = tail
          } else {
            val (batch, tail) = restB.splitAt(1 + rnd.nextInt(25))
            bIn.addData(batch); restB = tail
          }
          q.processAllAvailable()
        }
      } finally q.stop()
      val emitted = spark.table(s"uadiff$seed").collect().map(key).filter(_._3 < flushUs)
      assert(emitted.length == emitted.toSet.size, s"outcome emitted twice at seed $seed")
      assert(emitted.toSet == expect,
        s"stream/batch mismatch at seed $seed: extra=${(emitted.toSet -- expect).take(5)} " +
          s"missing=${(expect -- emitted.toSet).take(5)}")
    }
  }

  test("streaming dedup over random batch splits keeps exactly the batch survivors") {
    val rnd = new Random(124)
    // duplicate-heavy corpus fed in doc_id order: first arrival per
    // content = lowest doc_id = the batch survivor rule
    val texts = (1 to 12).map(i => s"content body $i")
    val docs = (1L to 80L).map(i => (i, texts(rnd.nextInt(texts.size))))
    val expect = docs.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet

    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDF().toDF("doc_id", "text")
      .withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))
    val deduped = EventStreams.dedupByContent(stream, "text", "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedupdiff")
      .outputMode("append").start()
    try {
      var rest = docs
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(25)
        val (batch, tail) = rest.splitAt(take)
        input.addData(batch)
        q.processAllAvailable()
        rest = tail
      }
    } finally q.stop()
    val kept = spark.table("dedupdiff").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == expect,
      s"survivor mismatch: extra=${kept -- expect} missing=${expect -- kept}")
  }

  test("sessionizeStream tombstones survive within the TTL and age out past it") {
    // gap 10 min, TTL 1 h: user 1's seq counter must carry across a
    // sub-TTL silence (second session numbered 2) and be DROPPED after
    // a full TTL of event-time silence (third session renumbers from
    // 1) — the bounded-state contract in the sessionizeStream scaladoc.
    val minUs = 60L * 1000000L
    val t0 = 24L * 60 * minUs // a day past the epoch (watermark-0 rule)
    var id = 0L
    def ev(u: Long, atUs: Long): GraftEvent = { id += 1; GraftEvent(u, id, atUs) }

    val input = MemoryStream[GraftEvent](spark)
    val stream = input.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select(col("user_id"), col("event_id"), col("ts"))
    val q = EventStreams.sessionizeStream(stream, gapSeconds = 600,
        watermarkDelay = "1 minute", tombstoneTtlSeconds = 3600)
      .writeStream.format("memory").queryName("tombttl")
      .outputMode("append").start()
    try {
      // each wm-advancing step feeds TWO user-2 batches because a
      // timeout fires one batch AFTER the watermark passes it (the
      // batch's timeout check uses the PREVIOUS batch-end watermark)
      val feed = Seq(
        Seq(ev(1, t0)),                       // open u1 session 1
        Seq(ev(2, t0 + 20 * minUs)), Seq(ev(2, t0 + 21 * minUs)),
        //   ^ wm past t0+gap: u1 s1 times out -> tombstone seq2, TTL t0+60min
        Seq(ev(1, t0 + 30 * minUs)),          // within TTL: opens seq-2 session
        Seq(ev(2, t0 + 50 * minUs)), Seq(ev(2, t0 + 51 * minUs)),
        //   ^ wm past t0+40min: u1 s2 times out -> tombstone seq3, TTL t0+90min
        Seq(ev(2, t0 + 180 * minUs)), Seq(ev(2, t0 + 181 * minUs)),
        //   ^ wm past t0+90min: u1 TOMBSTONE ages out (state removed, no emission)
        Seq(ev(1, t0 + 240 * minUs)),         // post-TTL return: must renumber from 1
        Seq(ev(2, t0 + 360 * minUs)), Seq(ev(2, t0 + 361 * minUs)))
        //   ^ wm past t0+250min: u1's returned session times out and emits
      feed.foreach { batch => input.addData(batch); q.processAllAvailable() }
    } finally q.stop()
    val u1 = spark.table("tombttl").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(3))) // (session_seq, start_us)
      .sortBy(_._2)
    assert(u1.toSeq == Seq((1L, t0), (2L, t0 + 30 * minUs), (1L, t0 + 240 * minUs)),
      s"tombstone TTL semantics diverged: got ${u1.toSeq} " +
        "(expected seq 2 within the TTL, renumber to 1 after it)")
  }
}
