package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q144: TIME-WEIGHTED AVERAGE (TWAP) — the step-function integral
  * mean every pricing/telemetry/billing pipeline needs when samples
  * arrive IRREGULARLY: a plain avg over events overweights bursty
  * periods; the honest statistic holds each observed `value` until
  * the next observation and weights it by how long it was held
  * (∫v dt / ∫dt). Per user over the events stream; the final
  * observation has no holding interval and is excluded (standard
  * left-closed step convention).
  *
  * Scale shape: ONE user-keyed exchange (the q21 per-user-history
  * window) for the `lead`, then one map-side-combined per-user
  * rollup — the canonical two-exchange sequence plan; nothing global,
  * no scalar bottleneck.
  *
  * Determinism: holding intervals are INTEGER micros
  * (unix_micros both engines, exact); v·Δt is ONE IEEE product of
  * bit-identical operands routed through DECIMAL(28,6) for the
  * order-independent sum (§6 dsumw); the denominator is an exact
  * int64 micros sum. The numerator decimal exceeds 2^53, and the two
  * engines' big-decimal→double conversions can disagree by 1 ulp
  * (observed at sf0.001), so the final quotient — a continuous
  * value — is rounded to 4 decimals on both sides (the q11 libm
  * rule).
  */
object Twap {

  /** Per-key time-weighted mean of `valCol` over observations at
    * `tsCol` (micros-integer weighting, last observation open).
    * Factored so the spec can pin a hand-computed two-segment hold
    * and the equal-spacing ≡ plain-average identity.
    */
  def twap(df: DataFrame, keyCol: String, tsCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    df
      .withColumn("graft_t", unix_micros(col(tsCol)))
      .withColumn("graft_gap", lead(col("graft_t"), 1).over(w) - col("graft_t"))
      .filter(col("graft_gap").isNotNull)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_holds"),
        sum(col("graft_gap")).as("span_micros"),
        round(det.dsumw(col(valCol) * col("graft_gap").cast("double")) /
          sum(col("graft_gap")).cast("double"), 4).as("twap"),
        det.davg(col(valCol)).as("plain_avg"))
  }

  val q144 = Q.of(
    "q144_time_weighted_avg",
    """WITH held AS (
      |  SELECT user_id, value,
      |    lead(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts)
      |      - epoch_us(ts) AS gap
      |  FROM events
      |)
      |SELECT user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_holds,
      |  CAST(SUM(gap) AS BIGINT) AS span_micros,
      |  round(CAST(SUM(CAST(value * CAST(gap AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE)
      |    / CAST(SUM(gap) AS DOUBLE), 4) AS twap,
      |  CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(value) AS plain_avg
      |FROM held
      |WHERE gap IS NOT NULL
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { t =>
    twap(t.events, "user_id", "ts", "value").orderBy(col("user_id"))
  }

  def all: Seq[Q] = Seq(q144)
}
