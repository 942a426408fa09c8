package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q209: CLASSICAL ADDITIVE SEASONAL DECOMPOSITION of the daily
  * revenue series — trend (centered 7-day moving average), per-weekday
  * seasonal index (mean detrended value, re-centered to sum to zero),
  * and Hyndman's seasonal-strength readout
  * Fs = max(0, 1 − Var(resid)/Var(detrended)) (both public: the
  * ratio-to-moving-average method is textbook; the strength measure
  * is from the feasts/tsfeatures literature). q48 reports seasonal
  * AGGREGATES, q185 scores a seasonal FORECAST, q200 alarms on
  * anomalies; this SEPARATES the series into the three components
  * those all implicitly assume.
  *
  * Determinism ladder (§6): the daily series is an exact D20_6 sum
  * and STAYS decimal through the 7-row centered window (window sums
  * of doubles are frame-order-dependent; of decimals, exact);
  * trend = window_sum/7 is ONE IEEE division; detrended = y − trend
  * is IEEE over those, QUANTIZED D18_6 at the day surface (the q129
  * rule) before the weekday fold, which is then an exact decimal
  * sum + one division; the re-centering mean and both variances ride
  * the same quantize→exact-fold→single-IEEE ladder. Incomplete
  * 7-day windows (series edges) are excluded by an integer count
  * compare, identically on both engines.
  *
  * Scale shape: ONE fact scan collapses to the bounded day-grain
  * series (map-side combined; q138's bound) — every window after
  * that runs over ~2.5k rows regardless of corpus size; output is
  * 7 weekday rows.
  */
object Decompose {

  /** Decompose a (day, y-decimal) daily frame. Emits one row per
    * weekday: dow (1=Sun..7=Sat), n_days, seasonal index, mean |resid|
    * and the global seasonal strength. Factored so the spec can pin a
    * hand-built pure-weekly series (seasonal recovered exactly,
    * strength 1) and a flat series (all zeros, strength 0).
    */
  def decompose(daily: DataFrame, day: Column, yDec: Column): DataFrame = {
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val detr = daily
      .select(day.as("day"), yDec.as("graft_y"))
      .withColumn("graft_wn", count(lit(1)).over(w7))
      .withColumn("graft_ws", sum(col("graft_y")).over(w7))
      .filter(col("graft_wn") === 7)
      .select(col("day"),
        (col("graft_y").cast("double")
          - col("graft_ws").cast("double") / lit(7.0)).cast(det.D18_6)
          .as("graft_d"))
    val dow = detr
      .groupBy(dayofweek(col("day")).as("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("graft_d")).as("graft_sd"))
      .select(col("dow"), col("n_days"),
        (col("graft_sd").cast("double") / col("n_days").cast("double"))
          .cast(det.D18_6).as("graft_s"))
    val center = dow.agg(
      count(lit(1)).as("graft_k"),
      sum(col("graft_s")).as("graft_ss"))
      .select((col("graft_ss").cast("double") / col("graft_k").cast("double"))
        .cast(det.D18_6).as("graft_c"))
    val seasonal = dow.join(broadcast(center))
      .select(col("dow"), col("n_days"),
        (col("graft_s") - col("graft_c")).as("graft_si"))
    val resid = detr
      .join(broadcast(seasonal.select(col("dow"), col("graft_si"))
        .withColumnRenamed("dow", "graft_dw")),
        dayofweek(col("day")) === col("graft_dw"))
      .select(col("graft_d"),
        (col("graft_d").cast("double") - col("graft_si").cast("double"))
          .cast(det.D18_6).as("graft_r"))
    val strength = resid.agg(
      count(lit(1)).as("graft_n"),
      sum(col("graft_d")).as("graft_sd"),
      sum((col("graft_d").cast("double") * col("graft_d").cast("double"))
        .cast(det.D28_6)).as("graft_sdd"),
      sum(col("graft_r")).as("graft_sr"),
      sum((col("graft_r").cast("double") * col("graft_r").cast("double"))
        .cast(det.D28_6)).as("graft_srr"))
      .select(
        when(col("graft_n").cast("double") * col("graft_sdd").cast("double")
          - col("graft_sd").cast("double") * col("graft_sd").cast("double")
          > 0.0,
          greatest(lit(0.0), lit(1.0) -
            (col("graft_n").cast("double") * col("graft_srr").cast("double")
              - col("graft_sr").cast("double") * col("graft_sr").cast("double"))
              / (col("graft_n").cast("double") * col("graft_sdd").cast("double")
                - col("graft_sd").cast("double") * col("graft_sd").cast("double"))))
          .as("seasonal_strength"))
    seasonal
      .join(broadcast(strength))
      .select(col("dow"), col("n_days"),
        col("graft_si").cast("double").as("seasonal"),
        col("seasonal_strength"))
  }

  val q209 = Q.of(
    "q209_seasonal_decompose",
    """WITH daily AS (
      |  SELECT l_shipdate AS day,
      |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS y
      |  FROM lineitem GROUP BY 1
      |), win AS (
      |  SELECT day, y,
      |    COUNT(*) OVER w AS wn,
      |    SUM(y) OVER w AS ws
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      |), detr AS (
      |  SELECT day,
      |    CAST(CAST(y AS DOUBLE) - CAST(ws AS DOUBLE) / 7.0 AS DECIMAL(18,6))
      |      AS d
      |  FROM win WHERE wn = 7
      |), dw AS (
      |  SELECT dayofweek(day) + 1 AS dow,
      |    CAST(COUNT(*) AS BIGINT) AS n_days,
      |    SUM(d) AS sd
      |  FROM detr GROUP BY 1
      |), dows AS (
      |  SELECT dow, n_days,
      |    CAST(CAST(sd AS DOUBLE) / CAST(n_days AS DOUBLE) AS DECIMAL(18,6))
      |      AS s
      |  FROM dw
      |), ctr AS (
      |  SELECT CAST(CAST(SUM(s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS DECIMAL(18,6)) AS c
      |  FROM dows
      |), seas AS (
      |  SELECT dow, n_days, s - c AS si FROM dows CROSS JOIN ctr
      |), resid AS (
      |  SELECT d,
      |    CAST(CAST(d AS DOUBLE) - CAST(si AS DOUBLE) AS DECIMAL(18,6)) AS r
      |  FROM detr JOIN seas ON dayofweek(detr.day) + 1 = seas.dow
      |), st AS (
      |  SELECT CASE WHEN CAST(COUNT(*) AS DOUBLE)
      |       * CAST(CAST(SUM(CAST(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
      |           AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
      |     - CAST(CAST(SUM(d) AS VARCHAR) AS DOUBLE)
      |       * CAST(CAST(SUM(d) AS VARCHAR) AS DOUBLE) > 0.0
      |   THEN GREATEST(0.0, 1.0 -
      |    (CAST(COUNT(*) AS DOUBLE)
      |       * CAST(CAST(SUM(CAST(CAST(r AS DOUBLE) * CAST(r AS DOUBLE)
      |           AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
      |     - CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE)
      |       * CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE))
      |    / (CAST(COUNT(*) AS DOUBLE)
      |       * CAST(CAST(SUM(CAST(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
      |           AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
      |     - CAST(CAST(SUM(d) AS VARCHAR) AS DOUBLE)
      |       * CAST(CAST(SUM(d) AS VARCHAR) AS DOUBLE)))
      |   END AS seasonal_strength
      |  FROM resid
      |)
      |SELECT dow, n_days, CAST(si AS DOUBLE) AS seasonal, seasonal_strength
      |FROM seas CROSS JOIN st
      |ORDER BY dow""".stripMargin) { t =>
    decompose(
      t.lineitem.groupBy(col("l_shipdate").as("day"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(det.D20_6)).as("y")),
      col("day"), col("y"))
      .orderBy(col("dow"))
  }

  def all: Seq[Q] = Seq(q209)
}
