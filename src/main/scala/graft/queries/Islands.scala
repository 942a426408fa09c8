package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q148: GAPS-AND-ISLANDS — consecutive-day activity streaks per
  * user, the canonical SQL pattern behind streak badges, retention
  * "active N days in a row" rules, and outage-window detection: a
  * user's distinct active days split into maximal runs of adjacent
  * dates ("islands") by the row_number trick — day − rank(day) is
  * CONSTANT exactly within a consecutive run, so one window plus one
  * aggregate finds every island with no self-join and no recursion.
  *
  * Scale shape: the fact collapses to distinct (user, day) in ONE
  * map-side-combined exchange; the ranking window rides the SAME user
  * partitioning (one shuffle total — the q21 sessionize shape at day
  * grain), and the island/user rollups are bounded by active days.
  * All integers/dates — hash-exact by construction.
  *
  * The per-user report: total active days, island count, longest
  * streak, and the longest streak's start day (EARLIEST on ties — a
  * deterministic tiebreak, the q138 argmax discipline).
  */
object Islands {

  /** Per-key consecutive-run summary over distinct (key, day) rows.
    * Factored so the spec can pin hand-built streak shapes (single
    * run, split runs, ties for longest).
    */
  def streaks(activity: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val days = activity.select(col(keyCol), col(dayCol).as("graft_day")).distinct()
    val w = Window.partitionBy(col(keyCol)).orderBy(col("graft_day"))
    val islands = days
      .withColumn("graft_grp",
        date_sub(col("graft_day"), row_number().over(w)))
      .groupBy(col(keyCol), col("graft_grp"))
      .agg(
        count(lit(1)).as("graft_len"),
        min(col("graft_day")).as("graft_start"))
    islands
      .withColumn("graft_mx",
        max(col("graft_len")).over(Window.partitionBy(col(keyCol))))
      .groupBy(col(keyCol))
      .agg(
        sum(col("graft_len")).as("n_active_days"),
        count(lit(1)).as("n_islands"),
        max(col("graft_len")).as("longest_streak"),
        min(when(col("graft_len") === col("graft_mx"), col("graft_start")))
          .as("longest_start"))
  }

  val q148 = Q.of(
    "q148_gaps_islands",
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), grp AS (
      |  SELECT user_id, day,
      |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
      |      AS g
      |  FROM days
      |), islands AS (
      |  SELECT user_id, g, COUNT(*) AS len, MIN(day) AS start
      |  FROM grp GROUP BY 1, 2
      |), ranked AS (
      |  SELECT user_id, len, start,
      |    MAX(len) OVER (PARTITION BY user_id) AS mx
      |  FROM islands
      |)
      |SELECT user_id,
      |  CAST(SUM(len) AS BIGINT) AS n_active_days,
      |  CAST(COUNT(*) AS BIGINT) AS n_islands,
      |  CAST(MAX(len) AS BIGINT) AS longest_streak,
      |  MIN(CASE WHEN len = mx THEN start END) AS longest_start
      |FROM ranked
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { t =>
    streaks(
      t.events.select(col("user_id"), to_date(col("ts")).as("day")),
      "user_id", "day")
      .orderBy(col("user_id"))
  }

  def all: Seq[Q] = Seq(q148)
}
