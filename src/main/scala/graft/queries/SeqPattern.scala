package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** q124: SEQUENCE-PATTERN matching over event streams — the
  * MATCH_RECOGNIZE shape (row-pattern recognition) expressed
  * Spark-first: each user-day's events become one ordered symbol
  * string (first letter of the event type — the five types map to
  * distinct symbols S/V/C/P/E), and the funnel pattern "a view, then
  * a purchase, with only clicks/errors between" is a regex
  * (`V[CE]*P`) counted per string, then rolled up to user grain.
  *
  * Why a string + regex and not a window walk: the pattern has a
  * Kleene star — "any number of clicks/errors between" — which no
  * fixed-width lag/lead window expresses (q06/q20 cover the
  * fixed-step funnels). Compiling the per-partition-ordered symbol
  * sequence to a string turns full regular-expression power loose on
  * it while staying inside codegen'd built-ins (`regexp_count`), the
  * same trick Flink's CEP and ANSI MATCH_RECOGNIZE implement natively.
  *
  * Scale shape: the symbol string is built per (user, day) — the
  * partition-within-order unit — so per-group state is bounded by a
  * user's events in ONE day (the q21 sessionize bound; an unbounded
  * whole-history string would be the q109-class mistake). One
  * exchange on (user_id, day) builds the sequences, one bounded
  * user-grain rollup follows; matching itself is a projection.
  * Ordering inside a group is (ts, event_id) — event_id is unique, so
  * the sort is total and both engines agree on the string.
  */
object SeqPattern {

  private val ConvPattern = "V[CE]*P"

  /** Per-(user, day) ordered symbol string + conversion count —
    * factored so the spec can feed crafted sequences (interleaved
    * funnels, same-timestamp ties, star-width extremes).
    */
  private[graft] def daySequences(events: DataFrame): DataFrame = {
    val sym = upper(substring(col("event_type"), 1, 1))
    events
      .select(col("user_id"), to_date(col("ts")).as("day"),
        struct(col("ts"), col("event_id"), sym.as("sym")).as("k"))
      .groupBy(col("user_id"), col("day"))
      .agg(array_join(
        transform(array_sort(collect_list(col("k"))), x => x.getField("sym")),
        "").as("seq"))
      .select(col("user_id"), col("day"), col("seq"),
        length(col("seq")).as("n_ev"),
        regexp_count(col("seq"), lit(ConvPattern)).as("n_conv"))
  }

  val q124 = Q.of(
    "q124_sequence_pattern",
    s"""WITH seqs AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    string_agg(upper(substr(event_type, 1, 1)), '' ORDER BY ts, event_id) AS seq
      |  FROM events GROUP BY 1, 2
      |), scored AS (
      |  SELECT user_id, day, length(seq) AS n_ev,
      |    len(regexp_extract_all(seq, '$ConvPattern')) AS n_conv
      |  FROM seqs
      |)
      |SELECT user_id,
      |  COUNT(*) AS n_days,
      |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
      |  CAST(SUM(n_conv) AS BIGINT) AS n_conversions,
      |  CAST(MAX(n_ev) AS BIGINT) AS max_day_events,
      |  MAX(CASE WHEN n_conv > 0 THEN day END) AS last_conv_day
      |FROM scored
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { t =>
    daySequences(t.events)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("n_ev")).as("n_events"),
        sum(col("n_conv")).as("n_conversions"),
        max(col("n_ev")).cast("long").as("max_day_events"),
        max(when(col("n_conv") > 0, col("day"))).as("last_conv_day"))
      .orderBy(col("user_id"))
  }

  def all: Seq[Q] = Seq(q124)
}
