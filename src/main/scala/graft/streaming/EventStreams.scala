package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event for stateful processing (timestamps as epoch micros —
  * identical to unix_micros(ts), so batch q21 and this path agree).
  */
final case class GraftEvent(user_id: Long, event_id: Long, ts_us: Long)

/** One closed session emitted by the stateful sessionizer. */
final case class GraftSession(user_id: Long, session_seq: Long, n_events: Long,
    start_us: Long, end_us: Long, duration_us: Long)

/** Open-session accumulator carried in GroupState between triggers. */
final case class SessState(seq: Long, n: Long, start_us: Long, last_us: Long)

/** Structured Streaming surface (SURVEY.md §2 q70–q71, §4).
  *
  * `hourlyCounts` is the watermarked tumbling-window aggregate — in
  * streaming mode Spark keeps only windows newer than the watermark in
  * the state store, so state is bounded by (window span / watermark
  * delay) × |event_type|. The batch-equivalent form (q70) is the same
  * logical aggregate, which is how the DuckDB oracle checks it.
  *
  * `sessionize` is flatMapGroupsWithState gap sessionization. On a
  * stream it emits a session when the gap closes it (or on event-time
  * timeout); on a batch Dataset Spark runs the same function once per
  * key with empty state — q71 runs it in batch mode and StreamingSpec
  * asserts it agrees with the declarative window-based q21.
  * Per-key events are sorted inside the group; at scale this holds
  * while a single user's events fit an executor (same bound as any
  * keyed-state operator).
  */
object EventStreams {
  implicit val eventEnc: Encoder[GraftEvent] = Encoders.product[GraftEvent]
  implicit val sessionEnc: Encoder[GraftSession] = Encoders.product[GraftSession]
  implicit val stateEnc: Encoder[SessState] = Encoders.product[SessState]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Watermarked tumbling 1-hour window counts per event type. Works on
    * a streaming or batch DataFrame with (ts: timestamp, event_type,
    * value) — on batch, withWatermark is a no-op.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(graft.functions.det.D20_6)).cast("double").as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n"), col("total_value"))

  /** Gap sessionization via flatMapGroupsWithState. Emits every closed
    * session; in batch mode all sessions close at end-of-group.
    */
  def sessionize(events: Dataset[GraftEvent], gapUs: Long): Dataset[GraftSession] =
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, GraftSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[GraftEvent], state: GroupState[SessState]) =>
          val sorted = it.toVector.sortBy(e => (e.ts_us, e.event_id))
          val out = Vector.newBuilder[GraftSession]
          var st = state.getOption.orNull
          for (e <- sorted) {
            if (st == null) st = SessState(1L, 1L, e.ts_us, e.ts_us)
            else if (e.ts_us - st.last_us > gapUs) {
              out += GraftSession(userId, st.seq, st.n, st.start_us, st.last_us,
                st.last_us - st.start_us)
              st = SessState(st.seq + 1, 1L, e.ts_us, e.ts_us)
            } else st = st.copy(n = st.n + 1, last_us = e.ts_us)
          }
          if (st != null) {
            // batch mode: the group is complete, close the open session.
            // (streaming mode would keep it in state until timeout)
            out += GraftSession(userId, st.seq, st.n, st.start_us, st.last_us,
              st.last_us - st.start_us)
            state.remove()
          }
          out.result().iterator
      }
}
