package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q145: AUTOCORRELATION function (ACF) — the lag-k self-similarity
  * profile of the daily event series for k = 1..7, the seasonality
  * detector that tells you WHICH period to model (a weekly cycle
  * shows as a lag-7 spike) before q48's calendar breakdown or q136's
  * smoothing assume one. Computed as Pearson correlation of
  * (x_t, x_{t−k}) pairs per lag — the sample-ACF variant that
  * re-centers per lag, i.e. corr over the overlapping window.
  *
  * Scale shape: the fact collapses to the daily count frame in ONE
  * map-side-combined exchange (bounded by the calendar); all 7 lags
  * come from ONE window pass over that bounded frame (single sort),
  * the long (k, x, y) form is an Expand over the bounded frame, and
  * the per-k moment rollup is 7 rows of constant state — classic
  * sufficient-statistics (q130): at 100 TB the only fact-sized work
  * is the daily pre-aggregate.
  *
  * Determinism: x, y are exact integer counts; moments are exact
  * DECIMAL(28,6) sums (§6 dsumw); the Pearson expression is the
  * identical IEEE formula on both sides, rounded 4 (the q11
  * precedent).
  */
object Acf {

  private val MaxLag = 7

  /** Lag-1..`maxLag` ACF of `valCol` ordered by `ordCol` (global
    * series). Factored so the spec can pin a period-2 alternating
    * series (acf(1) = −1, acf(2) = +1) and white-noise near-zero.
    */
  def acf(series: DataFrame, ordCol: String, valCol: String,
      maxLag: Int = MaxLag): DataFrame = {
    val w = Window.orderBy(col(ordCol)) // bounded series frame only
    val lagged = series.select(
      (col(valCol).cast("long").as("x") +:
        (1 to maxLag).map(k => lag(col(valCol), k).over(w).cast("long").as(s"graft_l$k"))): _*)
    val stackArgs = (1 to maxLag)
      .map(k => s"$k, x, graft_l$k").mkString(", ")
    lagged
      .select(expr(s"stack($maxLag, $stackArgs) as (k, x, y)"))
      .filter(col("y").isNotNull)
      .groupBy(col("k").cast("long").as("k"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(det.dcorr(col("x"), col("y")), 4).as("acf"))
  }

  val q145 = Q.of(
    "q145_autocorrelation",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1
      |), lagged AS (
      |  SELECT n AS x,
      |    lag(n, 1) OVER w AS l1, lag(n, 2) OVER w AS l2,
      |    lag(n, 3) OVER w AS l3, lag(n, 4) OVER w AS l4,
      |    lag(n, 5) OVER w AS l5, lag(n, 6) OVER w AS l6,
      |    lag(n, 7) OVER w AS l7
      |  FROM daily WINDOW w AS (ORDER BY day)
      |), long AS (
      |  SELECT ks.k, x,
      |    CASE ks.k WHEN 1 THEN l1 WHEN 2 THEN l2 WHEN 3 THEN l3 WHEN 4 THEN l4
      |              WHEN 5 THEN l5 WHEN 6 THEN l6 WHEN 7 THEN l7 END AS y
      |  FROM lagged, (VALUES (1),(2),(3),(4),(5),(6),(7)) ks(k)
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
      |  round((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 4) AS acf
      |FROM moments
      |ORDER BY k""".stripMargin) { t =>
    acf(
      t.events.groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n")),
      "day", "n")
      .orderBy(col("k"))
  }

  def all: Seq[Q] = Seq(q145)
}
