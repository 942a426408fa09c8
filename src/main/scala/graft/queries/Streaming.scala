package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.streaming.{EventStreams, GraftEvent}

/** Streaming-surface queries (SURVEY.md §2 q70–q71). Both run the
  * SAME operators that the streaming deployment uses
  * ([[graft.streaming.EventStreams]]), executed in batch mode here so
  * the driver's oracle/rows gates can check them; StreamingSpec runs
  * the actual readStream → memory-sink path and asserts equivalence.
  */
object Streaming {

  /** q70: tumbling 1-hour window aggregate — batch execution of the
    * watermarked streaming aggregate (the watermark node is eliminated
    * by Catalyst for batch inputs, leaving the identical groupBy).
    */
  val q70 = Q.of(
    "q70_stream_window_agg",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin) { t =>
    EventStreams.hourlyCounts(t.events)
      .orderBy(col("hour"), col("event_type"))
  }

  /** q71: stateful gap sessionization (flatMapGroupsWithState) in
    * batch mode. ORACLE (round 11 — formerly rows-only): the stateful
    * sessionizer's batch output is definitionally q21's window-based
    * gap sessionization at (user, session) grain, so the oracle is
    * q21's SQL re-projected onto the GraftSession schema (epoch-micro
    * start/end instead of timestamps). StreamingSpec keeps the
    * readStream leg: batch ≡ stream across random epoch splits.
    */
  val q71 = Q.of(
    "q71_stream_session",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), seqd AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged
      |)
      |SELECT user_id, session_seq,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MIN(epoch_us(ts)) AS start_us,
      |  MAX(epoch_us(ts)) AS end_us,
      |  MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us
      |FROM seqd
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin) { t =>
    import EventStreams._
    val events = t.events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .as[GraftEvent](eventEnc)
    EventStreams.sessionize(events, gapUs = 1800L * 1000000L)
      .toDF()
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** q72: streaming content dedup (dropDuplicatesWithinWatermark on
    * md5(text)) in batch mode, aggregated to survivor-invariant totals:
    * which row of a duplicate group survives depends on arrival order,
    * but the count and the per-hash n_chars (identical text ⇒ identical
    * n_chars) do not, so the aggregate has an exact oracle. The ts
    * column the watermark needs is synthesized deterministically from
    * doc_id — pure plumbing, it never affects the result.
    * StreamingSpec runs the real readStream path and asserts the
    * survivor set matches batch q40's per content hash.
    */
  val q72 = Q.of(
    "q72_stream_dedup",
    """SELECT COUNT(*) AS n_unique_docs, CAST(SUM(nc) AS BIGINT) AS unique_chars
      |FROM (SELECT md5(text) AS h, MIN(n_chars) AS nc
      |      FROM documents GROUP BY md5(text))""".stripMargin) { t =>
    val docs = t.documents.withColumn("ts",
      timestamp_micros(col("doc_id") * 1000000L + lit(1704067200000000L)))
    EventStreams.dedupByContent(docs, "text", "1 hour")
      .agg(count(lit(1)).as("n_unique_docs"), sum(col("n_chars")).as("unique_chars"))
  }

  /** q73: stream-static enrichment join in batch mode — the streaming
    * deployment's exact operator ([[EventStreams.enrichedSegmentCounts]]);
    * StreamingSpec drives the readStream path and asserts it equals
    * this batch result.
    */
  val q73 = Q.of(
    "q73_stream_enrich",
    """SELECT c_mktsegment AS segment, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2
      |ORDER BY segment, event_type""".stripMargin) { t =>
    EventStreams.enrichedSegmentCounts(t.events, t.customer)
      .orderBy(col("segment"), col("event_type"))
  }

  /** q76: stream-stream interval-join attribution in batch mode — the
    * streaming deployment's exact operator
    * ([[EventStreams.attributeWithin]]): every 'purchase' attributed to
    * each preceding same-user 'view' within 24h. Deterministic pair
    * set (no aggregation needed), so the oracle is exact at row level;
    * StreamingSpec drives the readStream self-join path and
    * StreamingDifferentialSpec sweeps random MemoryStream batch splits
    * against this batch answer. Timestamps compare as epoch micros on
    * both engines (DuckDB ns-truncation ≡ Tables.events `ts div
    * 1000`).
    */
  val q76 = Q.of(
    "q76_stream_attribution",
    """SELECT i.user_id, i.event_id AS imp_id, o.event_id AS out_id,
      |  epoch_us(i.ts) AS imp_us, epoch_us(o.ts) AS out_us,
      |  epoch_us(o.ts) - epoch_us(i.ts) AS delay_us
      |FROM events i JOIN events o ON o.user_id = i.user_id
      | AND i.event_type = 'view' AND o.event_type = 'purchase'
      | AND epoch_us(o.ts) > epoch_us(i.ts)
      | AND epoch_us(o.ts) - epoch_us(i.ts) <= 86400000000
      |ORDER BY i.user_id, imp_id, out_id""".stripMargin) { t =>
    val events = t.events
    EventStreams.attributeWithin(
      events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "purchase"),
      maxDelaySeconds = 86400L)
      .orderBy(col("user_id"), col("imp_id"), col("out_id"))
  }

  /** q77: LAST-TOUCH attribution in batch mode — q76's interval join
    * reduced to one row per outcome ([[EventStreams.lastTouchWithin]]):
    * the production attribution semantic AND the hot-key output bound
    * (all-pairs is views×purchases per user; last-touch is ∝ outcomes
    * only). The streaming form chains the watermarked join into a
    * windowed max-aggregate (two stateful operators); StreamingSpec
    * and StreamingDifferentialSpec prove stream ≡ batch. Tie-break on
    * (imp_us, imp_id) descending, mirrored in the oracle.
    */
  val q77 = Q.of(
    "q77_stream_last_touch",
    """SELECT user_id, out_id, imp_id, imp_us, out_us, delay_us FROM (
      |  SELECT i.user_id, o.event_id AS out_id, i.event_id AS imp_id,
      |    epoch_us(i.ts) AS imp_us, epoch_us(o.ts) AS out_us,
      |    epoch_us(o.ts) - epoch_us(i.ts) AS delay_us,
      |    row_number() OVER (PARTITION BY o.event_id
      |      ORDER BY epoch_us(i.ts) DESC, i.event_id DESC) AS rk
      |  FROM events i JOIN events o ON o.user_id = i.user_id
      |   AND i.event_type = 'view' AND o.event_type = 'purchase'
      |   AND epoch_us(o.ts) > epoch_us(i.ts)
      |   AND epoch_us(o.ts) - epoch_us(i.ts) <= 86400000000
      |) WHERE rk = 1
      |ORDER BY user_id, out_id""".stripMargin) { t =>
    val events = t.events
    EventStreams.lastTouchWithin(
      events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "purchase"),
      maxDelaySeconds = 86400L)
      .orderBy(col("user_id"), col("out_id"))
  }

  /** q90: streaming corpus curation in batch mode — the streaming
    * deployment's exact operator ([[EventStreams.curatedCounts]]):
    * PII-redact + repetition-verdict every document, roll up per
    * (lang, verdict) with redacted-char accounting. All per-row logic
    * is the oracle-checked q84/q87 machinery (same expressions, same
    * §6 cross-engine contract — the oracle below recomposes both
    * inline); StreamingSpec drives the readStream file-source path and
    * asserts it equals this batch result row-for-row.
    */
  val q90 = Q.of(
    "q90_stream_curation",
    """SELECT lang, verdict, COUNT(*) AS n_docs,
      |  CAST(SUM(length(regexp_replace(regexp_replace(t2,
      |    '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
      |    '[0-9]{7,}', '<NUM>', 'g'))) AS BIGINT) AS redacted_chars
      |FROM (
      |  SELECT lang, t2,
      |    CASE WHEN n_words >= 20 AND distinct_ratio >= 0.5
      |          AND top_word_fraction <= 0.125 AND dup_bigram_fraction <= 0.0625
      |         THEN 'keep' ELSE 'drop' END AS verdict
      |  FROM (
      |    SELECT lang, t2, len(w) AS n_words,
      |      CAST(len(list_distinct(w)) AS DOUBLE) / NULLIF(len(w), 0) AS distinct_ratio,
      |      CAST((SELECT max(c) FROM (SELECT count(*) AS c FROM unnest(w) AS t(x) GROUP BY x)) AS DOUBLE)
      |        / NULLIF(len(w), 0) AS top_word_fraction,
      |      COALESCE(1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / NULLIF(len(bi), 0), 0.0) AS dup_bigram_fraction
      |    FROM (
      |      SELECT lang, string_split(text, ' ') AS w,
      |        list_transform(range(1, len(string_split(text, ' '))),
      |          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]) AS bi,
      |        text || ' contact user' || CAST(doc_id AS VARCHAR)
      |             || '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.com ref '
      |             || CAST(1000000 + doc_id * 7919 AS VARCHAR) AS t2
      |      FROM documents
      |    )
      |  )
      |)
      |GROUP BY lang, verdict
      |ORDER BY lang, verdict""".stripMargin) { t =>
    EventStreams.curatedCounts(t.documents)
      .orderBy(col("lang"), col("verdict"))
  }

  /** q99: the UNATTRIBUTED-outcome report in batch mode — the
    * left-outer twin of q76/q77 ([[EventStreams.unattributedWithin]]):
    * one row per purchase with its qualifying-view count, INCLUDING
    * the zero-touch conversions the inner joins drop — the funnel-gap
    * monitor. `count(imp_id)` over the null-padded outer rows makes
    * "no touch" an explicit 0; `last_touch_us` stays NULL there (not
    * a sort key — §6(f) doesn't bite). StreamingSpec proves the
    * chained outer-join → aggregate stream emits exactly the closed
    * outcomes; the oracle checks the batch twin row-exactly.
    */
  val q99 = Q.of(
    "q99_stream_unattributed",
    """SELECT user_id, out_id, out_us, n_touches, last_touch_us FROM (
      |  SELECT o.user_id, o.event_id AS out_id, epoch_us(o.ts) AS out_us,
      |    CAST(count(i.event_id) AS BIGINT) AS n_touches,
      |    max(epoch_us(i.ts)) AS last_touch_us
      |  FROM events o LEFT JOIN events i ON i.user_id = o.user_id
      |   AND i.event_type = 'view'
      |   AND epoch_us(o.ts) > epoch_us(i.ts)
      |   AND epoch_us(o.ts) - epoch_us(i.ts) <= 86400000000
      |  WHERE o.event_type = 'purchase'
      |  GROUP BY o.user_id, o.event_id, epoch_us(o.ts)
      |)
      |ORDER BY user_id, out_id""".stripMargin) { t =>
    val events = t.events
    EventStreams.unattributedWithin(
      events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "purchase"),
      maxDelaySeconds = 86400L)
      .orderBy(col("user_id"), col("out_id"))
  }

  /** q114: the streaming near-dup ADMISSION gate in batch mode
    * ([[EventStreams.nearDupFlagged]]) — the streaming twin of q112's
    * incremental dedup: the delta stream (`doc_id % 5 = 0`, event time
    * = one doc per minute from 2024-01-01) is near-dup-checked against
    * the STATIC base corpus via the banded stream-static join, and
    * flagged docs roll up per (hour window, doc). The oracle is the
    * O(n²) exact delta×base jaccard scan + window-start arithmetic
    * (1704067200 is hour-aligned, so the window start is closed-form
    * in doc_id); StreamingSpec drives the same operator through
    * MemoryStream micro-batches and asserts the append-mode emissions
    * match this batch answer on watermark-closed windows.
    */
  val q114 = Q.of(
    "q114_stream_neardup",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 1), 1),
      |                                 i -> substr(text, i, 5))) AS s
      |  FROM documents
      |), pr AS (
      |  SELECT d.doc_id AS sd, b.doc_id AS bd
      |  FROM sh d JOIN sh b ON d.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      |  WHERE CAST(len(list_intersect(d.s, b.s)) AS DOUBLE)
      |      / len(list_distinct(list_concat(d.s, b.s))) >= 0.8
      |)
      |SELECT CAST((1704067200 + (sd // 60) * 3600) * 1000000 AS BIGINT) AS win_start_us,
      |  sd AS doc_id, CAST(count(*) AS BIGINT) AS n_base_dups
      |FROM pr GROUP BY sd
      |ORDER BY doc_id""".stripMargin) { t =>
    val docs = t.documents.select(col("doc_id"), col("text"))
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("ts",
        timestamp_micros(col("doc_id") * 60000000L + lit(1704067200000000L)))
    val base = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    EventStreams.nearDupFlagged(delta, base)
      .orderBy(col("doc_id"))
  }

  def all: Seq[Q] = Seq(q70, q71, q72, q73, q76, q77, q90, q99, q114)
}
