package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q164: TOP-K COMMON JOURNEYS — the most frequent session-opening
  * paths (each user-day's first three event symbols in order), the
  * product question behind every onboarding/navigation review
  * ("how do sessions actually start?"): q139 models one-step
  * transitions, q124 matches a GIVEN pattern; this DISCOVERS the
  * dominant prefixes, ranked with a deterministic tiebreak.
  *
  * Scale shape: the per-(user, day) prefix is a rank-and-filter over
  * the q21 sessionize window (ONE user-keyed exchange — rows past
  * rank 3 are dropped before any aggregation), the journey rollup is
  * map-side combined with output bounded by |alphabet|³, and the
  * top-k is a rank over that bounded frame. Ordering tiebreaks
  * (ts, event_id) within a day and (count desc, journey asc) across
  * journeys — hash-exact (q124/q150 discipline).
  */
object Journeys {

  private val PrefixLen = 3
  private val TopK = 10

  /** Top-`k` `len`-step opening paths over (key, day, ordered
    * symbols). Factored so the spec can pin prefix truncation, short
    * days, and the rank tiebreak.
    */
  def top(events: DataFrame, userCol: String, tsCol: String, idCol: String,
      symCol: String, len: Int = PrefixLen, k: Int = TopK): DataFrame = {
    val day = to_date(col(tsCol))
    val journeys = events
      .withColumn("graft_rn", row_number().over(
        Window.partitionBy(col(userCol), day).orderBy(col(tsCol), col(idCol))))
      .filter(col("graft_rn") <= len)
      .groupBy(col(userCol), day.as("graft_day"))
      .agg(concat_ws(">", array_sort(collect_list(
        struct(col("graft_rn"), col(symCol)))).getField(symCol).cast("array<string>"))
        .as("journey"))
    journeys
      .groupBy(col("journey"))
      .agg(count(lit(1)).as("n_sessions"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("journey"))).cast("long"))
      .filter(col("rank") <= k)
  }

  val q164 = Q.of(
    "q164_top_journeys",
    """WITH ranked AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
      |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events
      |), prefixes AS (
      |  SELECT user_id, day,
      |    string_agg(event_type, '>' ORDER BY rn) AS journey
      |  FROM ranked WHERE rn <= 3
      |  GROUP BY 1, 2
      |), counts AS (
      |  SELECT journey, COUNT(*) AS n_sessions FROM prefixes GROUP BY 1
      |)
      |SELECT journey, CAST(n_sessions AS BIGINT) AS n_sessions,
      |  CAST(row_number() OVER (ORDER BY n_sessions DESC, journey) AS BIGINT) AS rank
      |FROM counts
      |QUALIFY rank <= 10
      |ORDER BY rank""".stripMargin) { t =>
    top(t.events, "user_id", "ts", "event_id", "event_type")
      .orderBy(col("rank"))
  }

  def all: Seq[Q] = Seq(q164)
}
