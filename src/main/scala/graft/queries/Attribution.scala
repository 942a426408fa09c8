package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q201: MULTI-TOUCH POSITIONAL ATTRIBUTION — the batch credit-
  * assignment family over the q76 impression→outcome machinery:
  * q76 emits ALL qualifying touches, q77 picks the LAST one; a
  * marketing/analytics stack also ships LINEAR (1/n each), FIRST,
  * and U-SHAPED (40/20/40: first 0.4, last 0.4, middle split 0.2 —
  * position-based attribution, public adtech canon) credit per
  * channel. One query computes all four columns so the schemes are
  * comparable on identical journeys.
  *
  * Journey definition (deterministic): each purchase credits the
  * same-user view/click touches in the strict 7-day lookback,
  * ordered by (ts, event_id) — the total-order tiebreak; n = 1
  * takes full credit in every scheme, n = 2 splits U as 0.5/0.5
  * (the degenerate-middle rule stated, not improvised).
  *
  * Determinism: per-touch credits are IEEE divisions of exact
  * integers (1/n, 0.2/(n−2)) computed token-identically and
  * quantized to D18_6 BEFORE the per-channel sum (§6 routing — the
  * sum is order-independent); scheme totals are exact decimals cast
  * to double once.
  *
  * Scale shape: ONE user_id-keyed interval join (both sides filtered
  * and projected before the exchange — q76's shape, state bounded by
  * the 7-day window), one per-purchase window pair (rank + count
  * over the bounded touch set), and a channel-grain rollup whose
  * exchange carries ≤ |channels| rows. Hot-key bound: a journey's
  * touch count is bounded by the lookback window, and the output is
  * channel-grain regardless of user count.
  */
object Attribution {

  private val LookbackDays = 7

  /** Positional credit per channel from (conv_id, channel, rk, n)
    * journeys. Factored so the spec can pin the n = 1 / n = 2
    * degenerate splits, the 40/20/40 arithmetic, and that every
    * scheme's total credit equals the journey count to within the
    * D18_6 quantization (per-touch credits are quantized before
    * summing, so e.g. a 3-touch linear journey sums to 0.999999 —
    * the identity holds with a 1e-6-per-touch tolerance, not
    * exactly).
    */
  def positionalCredit(journeys: DataFrame): DataFrame = {
    val n = col("n").cast("double")
    val linear = lit(1.0) / n
    val first = when(col("rk") === 1, lit(1.0)).otherwise(lit(0.0))
    val last = when(col("rk") === col("n"), lit(1.0)).otherwise(lit(0.0))
    val u = when(col("n") === 1, lit(1.0))
      .when(col("n") === 2, lit(0.5))
      .when(col("rk") === 1 || col("rk") === col("n"), lit(0.4))
      .otherwise(lit(0.2) / (n - lit(2.0)))
    journeys
      .groupBy(col("channel"))
      .agg(
        count(lit(1)).as("n_touches"),
        sum(linear.cast(det.D18_6)).cast("double").as("credit_linear"),
        sum(first.cast(det.D18_6)).cast("double").as("credit_first"),
        sum(last.cast(det.D18_6)).cast("double").as("credit_last"),
        sum(u.cast(det.D18_6)).cast("double").as("credit_u"))
  }

  val q201 = Q.of(
    "q201_position_attribution",
    s"""WITH conv AS (
      |  SELECT event_id AS conv_id, user_id, ts AS conv_ts
      |  FROM events WHERE event_type = 'purchase'
      |), touch AS (
      |  SELECT event_id AS touch_id, user_id, ts AS touch_ts,
      |    event_type AS channel
      |  FROM events WHERE event_type IN ('view', 'click')
      |), j AS (
      |  SELECT c.conv_id, t.channel, t.touch_ts, t.touch_id
      |  FROM conv c JOIN touch t ON t.user_id = c.user_id
      |    AND t.touch_ts < c.conv_ts
      |    AND t.touch_ts >= c.conv_ts - INTERVAL '$LookbackDays' DAY
      |), ranked AS (
      |  SELECT conv_id, channel,
      |    ROW_NUMBER() OVER (PARTITION BY conv_id
      |      ORDER BY touch_ts, touch_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY conv_id) AS n
      |  FROM j
      |)
      |SELECT channel,
      |  COUNT(*) AS n_touches,
      |  CAST(SUM(CAST(1.0 / CAST(n AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
      |    AS credit_linear,
      |  CAST(SUM(CAST(CASE WHEN rk = 1 THEN 1.0 ELSE 0.0 END
      |    AS DECIMAL(18,6))) AS DOUBLE) AS credit_first,
      |  CAST(SUM(CAST(CASE WHEN rk = n THEN 1.0 ELSE 0.0 END
      |    AS DECIMAL(18,6))) AS DOUBLE) AS credit_last,
      |  CAST(SUM(CAST(
      |    CASE WHEN n = 1 THEN 1.0
      |         WHEN n = 2 THEN 0.5
      |         WHEN rk = 1 OR rk = n THEN 0.4
      |         ELSE 0.2 / (CAST(n AS DOUBLE) - 2.0) END
      |    AS DECIMAL(18,6))) AS DOUBLE) AS credit_u
      |FROM ranked
      |GROUP BY channel
      |ORDER BY channel""".stripMargin) { t =>
    val ev = t.events
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("ts").as("conv_ts"))
    val touch = ev.filter(col("event_type").isin("view", "click"))
      .select(col("event_id").as("touch_id"), col("user_id"),
        col("ts").as("touch_ts"), col("event_type").as("channel"))
    val j = conv.join(touch, Seq("user_id"))
      .filter(col("touch_ts") < col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - expr(s"INTERVAL $LookbackDays DAY"))
      .select(col("conv_id"), col("channel"), col("touch_ts"), col("touch_id"))
    val byConv = Window.partitionBy(col("conv_id"))
    val journeys = j
      .withColumn("rk", row_number().over(
        byConv.orderBy(col("touch_ts"), col("touch_id"))))
      .withColumn("n", count(lit(1)).over(byConv))
    positionalCredit(journeys).orderBy(col("channel"))
  }

  def all: Seq[Q] = Seq(q201)
}
