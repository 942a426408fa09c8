package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q178: CROSS-CORRELATION function (CCF) — the lead-lag profile
  * between TWO daily event series (clicks vs purchases) at lags
  * k = −3..+3: ccf(k) = corr(x_t, y_{t+k}), so a positive-k spike
  * reads "x LEADS y by k days" — the causality-direction screen an
  * analyst runs before any uplift claim (q145 is the self-similarity
  * special case x = y; q11/q131 correlate cross-sectional columns,
  * not series at an offset).
  *
  * Scale shape: the fact collapses to the (day, type) count frame in
  * ONE map-side-combined exchange (bounded by calendar × type); the
  * two series land as zero-filled x/y columns of one day-grain frame
  * (conditional aggregate, no join — a day missing one type is a
  * true zero, not a dropped pair); all 7 offsets come from ONE
  * window pass (lead for positive k, lag for negative), the long
  * (k, x, y) form is an Expand over the bounded frame, and the
  * per-k moment rollup is 7 rows of constant state (q130
  * sufficient-statistics discipline).
  *
  * Determinism: x, y are exact integer counts; moments are exact
  * decimal sums (§6 dsumw inside det.dcorr); the Pearson expression
  * is the identical IEEE formula both engines, round 4 (q11/q145
  * precedent). Overlap windows differ per k, so each k re-centers
  * over its own pairs — the sample-CCF variant matching q145's ACF.
  */
object CrossCorr {

  private val MaxLag = 3
  private val TypeX = "click"
  private val TypeY = "purchase"

  /** CCF of zero-filled integer series `x`, `y` over the ordered
    * frame, lags −`maxLag`..+`maxLag`. Factored so the spec can pin
    * a shifted-copy pair (ccf peaks exactly at the shift), the
    * symmetric self case, and the per-k pair counts.
    */
  def ccf(series: DataFrame, ordCol: String, maxLag: Int = MaxLag): DataFrame = {
    val w = Window.orderBy(col(ordCol)) // bounded series frame only
    val shifted = series.select(
      (col("x") +: (-maxLag to maxLag).map { k =>
        val c = if (k < 0) lag(col("y"), -k).over(w) else lead(col("y"), k).over(w)
        c.as(s"graft_s${k + maxLag}")
      }): _*)
    val stackArgs = (-maxLag to maxLag)
      .map(k => s"$k, x, graft_s${k + maxLag}").mkString(", ")
    shifted
      .select(expr(s"stack(${2 * maxLag + 1}, $stackArgs) as (k, x, y)"))
      .filter(col("y").isNotNull)
      .groupBy(col("k").cast("long").as("k"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(det.dcorr(col("x"), col("y")), 4).as("ccf"))
  }

  val q178 = Q.of(
    "q178_cross_correlation",
    s"""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    SUM(CASE WHEN event_type = '$TypeX' THEN 1 ELSE 0 END) AS x,
      |    SUM(CASE WHEN event_type = '$TypeY' THEN 1 ELSE 0 END) AS y
      |  FROM events WHERE event_type IN ('$TypeX', '$TypeY')
      |  GROUP BY 1
      |), shifted AS (
      |  SELECT x,
      |    lag(y, 3) OVER w AS sm3, lag(y, 2) OVER w AS sm2, lag(y, 1) OVER w AS sm1,
      |    y AS s0,
      |    lead(y, 1) OVER w AS sp1, lead(y, 2) OVER w AS sp2, lead(y, 3) OVER w AS sp3
      |  FROM daily WINDOW w AS (ORDER BY day)
      |), long AS (
      |  SELECT ks.k, x,
      |    CASE ks.k WHEN -3 THEN sm3 WHEN -2 THEN sm2 WHEN -1 THEN sm1 WHEN 0 THEN s0
      |              WHEN 1 THEN sp1 WHEN 2 THEN sp2 WHEN 3 THEN sp3 END AS y
      |  FROM shifted, (VALUES (-3),(-2),(-1),(0),(1),(2),(3)) ks(k)
      |), moments AS (
      |  SELECT k,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    COUNT(*) AS n_pairs,
      |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(x*x AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(y*y AS DECIMAL(28,6))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(x*y AS DECIMAL(28,6))) AS DOUBLE) AS sxy
      |  FROM long WHERE y IS NOT NULL GROUP BY k
      |)
      |SELECT CAST(k AS BIGINT) AS k,
      |  CAST(n_pairs AS BIGINT) AS n_pairs,
      |  round((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 4) AS ccf
      |FROM moments
      |ORDER BY k""".stripMargin) { t =>
    ccf(
      t.events
        .filter(col("event_type").isin(TypeX, TypeY))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          sum(when(col("event_type") === TypeX, 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === TypeY, 1L).otherwise(0L)).as("y")),
      "day")
      .orderBy(col("k"))
  }

  def all: Seq[Q] = Seq(q178)
}
