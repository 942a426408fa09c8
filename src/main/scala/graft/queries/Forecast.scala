package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q185: SEASONAL-NAIVE FORECAST evaluation — per event type, score
  * the two zero-parameter baselines every forecasting effort must
  * beat: naive-1 (ŷ_t = y_{t−1}) and seasonal-naive-7
  * (ŷ_t = y_{t−7}), reporting MAE for both and MASE = MAE₇/MAE₁
  * (Hyndman & Koehler 2006, public — the scale-free "is the weekly
  * cycle real signal" readout: MASE < 1 ⟺ last-week beats
  * yesterday ⟺ the q145/q48 seasonality is strong enough to
  * forecast with). The evaluation leg the time-series suite lacked:
  * q136/q168 SMOOTH a series, q145 DETECTS periodicity — this
  * quantifies forecast skill on a common error scale.
  *
  * Determinism: daily counts are exact integers, so every |error| is
  * an exact int64 and both MAE numerators are integer sums; each MAE
  * is ONE IEEE division, and MASE is one division of those two
  * doubles — token-identical both engines (§6 round 4). Both error
  * sets are restricted to the days where BOTH forecasts exist
  * (t ≥ 8th observed day) so the ratio compares like for like.
  *
  * Scale shape: the fact collapses to the (type, day) count frame in
  * ONE map-side-combined exchange (calendar × type bounded); both
  * lags come from ONE window pass per type partition; the rollup is
  * a bounded per-type aggregate of constant state. Missing calendar
  * days are real gaps — the lag is over OBSERVED days (the q148
  * islands caveat documented, matching the oracle exactly).
  */
object Forecast {

  /** Per-group naive-vs-seasonal forecast errors over an ordered
    * integer series. Factored so the spec can pin a hand-computed
    * pure-period-7 series (MAE₇ = 0, MASE = 0), a trend series
    * (naive-1 wins, MASE > 1), and the short-series NULL guard
    * (< 8 points → no scored days).
    */
  def mase(series: DataFrame, groupCol: String, ordCol: String,
      vCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(ordCol))
    series
      .withColumn("graft_l1", lag(col(vCol), 1).over(w))
      .withColumn("graft_l7", lag(col(vCol), 7).over(w))
      .filter(col("graft_l7").isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_scored"),
        sum(abs(col(vCol) - col("graft_l1"))).as("graft_e1"),
        sum(abs(col(vCol) - col("graft_l7"))).as("graft_e7"))
      .select(
        col(groupCol),
        col("n_scored"),
        (col("graft_e1").cast("double") / col("n_scored")).as("mae_naive1"),
        (col("graft_e7").cast("double") / col("n_scored")).as("mae_seasonal7"),
        when(col("graft_e1") > 0,
          (col("graft_e7").cast("double") / col("n_scored")) /
            (col("graft_e1").cast("double") / col("n_scored")))
          .as("mase"))
  }

  val q185 = Q.of(
    "q185_seasonal_naive_mase",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
      |  FROM events GROUP BY 1, 2
      |), lagged AS (
      |  SELECT event_type, y,
      |    lag(y, 1) OVER w AS l1,
      |    lag(y, 7) OVER w AS l7
      |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
      |)
      |SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_scored,
      |  CAST(SUM(ABS(y - l1)) AS DOUBLE) / COUNT(*) AS mae_naive1,
      |  CAST(SUM(ABS(y - l7)) AS DOUBLE) / COUNT(*) AS mae_seasonal7,
      |  CASE WHEN SUM(ABS(y - l1)) > 0 THEN
      |    (CAST(SUM(ABS(y - l7)) AS DOUBLE) / COUNT(*)) /
      |    (CAST(SUM(ABS(y - l1)) AS DOUBLE) / COUNT(*))
      |  END AS mase
      |FROM lagged WHERE l7 IS NOT NULL
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { t =>
    mase(
      t.events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y")),
      "event_type", "day", "y")
      .orderBy(col("event_type"))
  }

  def all: Seq[Q] = Seq(q185)
}
