package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q173: ROLLING 7-DAY ACTIVE USERS — per day, DAU, trailing-window
  * WAU, and the DAU/WAU stickiness ratio: the product-health
  * headline metric beside q169's weekly flow decomposition (q169
  * explains WHY actives moved; this is the daily series everyone
  * charts). Distinct-over-a-sliding-window is NOT decomposable — a
  * windowed sum of daily distincts double-counts returning users —
  * which is exactly why this needs its own shape (and why q100/q162
  * exist as the mergeable approximate/bitmap scale paths).
  *
  * Shape — CONTRIBUTION EXPLODE instead of a window: a user active
  * on day d counts toward the trailing WAU of days d..d+6, so
  * presence explodes into at most 7 contribution rows, distinct on
  * (user, target day) collapses multi-active users, and a plain
  * count per day finishes it. That turns "distinct over an interval
  * join" into two hash exchanges with NO range join and NO per-day
  * re-scan of the window; amplification is bounded by the window
  * length (7×presence, and presence is already user×day distinct —
  * far below the fact). The spine join keeps only observed days, so
  * both engines emit the same day set.
  *
  * Determinism: all counts are exact integers on UTC calendar days;
  * stickiness is ONE IEEE division of exact integers (q128 rule —
  * bit-equal, no rounding). DAU ≤ WAU by construction (presence day
  * contributes to its own trailing window).
  */
object RollingDistinct {

  private val WindowDays = 7

  /** Per-day DAU / trailing-`windowDays` distinct actives /
    * stickiness over `(userCol, dayCol)` presence. Factored so the
    * spec can pin the window edge (day 8 forgets day 1), returning
    * users collapsing, and DAU = WAU on isolated days.
    */
  def trailingActives(presence: DataFrame, userCol: String, dayCol: String,
      windowDays: Int): DataFrame = {
    val p = graft.CacheScope.trackedCache(
      presence.select(col(userCol).as("graft_u"), col(dayCol).as("day")).distinct())
    val dau = p.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val contrib = p
      .select(col("graft_u"),
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1))).as("day"))
      .distinct()
    val wau = contrib
      .join(p.select(col("day")).distinct(), Seq("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
  }

  val q173 = Q.of(
    "q173_rolling_active",
    s"""WITH p AS (
      |  SELECT DISTINCT user_id AS uid, CAST(ts AS DATE) AS d FROM events
      |), dau AS (
      |  SELECT d, COUNT(*) AS dau FROM p GROUP BY d
      |), wau AS (
      |  SELECT s.d, COUNT(DISTINCT p.uid) AS wau
      |  FROM (SELECT DISTINCT d FROM p) s
      |  JOIN p ON p.d BETWEEN s.d - ${WindowDays - 1} AND s.d
      |  GROUP BY s.d
      |)
      |SELECT dau.d AS day, dau.dau, wau.wau,
      |  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
      |FROM dau JOIN wau ON dau.d = wau.d
      |ORDER BY day""".stripMargin) { t =>
    trailingActives(
      t.events.select(col("user_id"), to_date(col("ts")).as("day")),
      "user_id", "day", WindowDays)
      .orderBy(col("day"))
  }

  def all: Seq[Q] = Seq(q173)
}
