package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q142: KAPLAN-MEIER survival estimation (Kaplan & Meier 1958,
  * public) — the right-censoring-aware retention curve behind every
  * honest churn/LTV readout (q39/q56 report composition; this is the
  * estimator that does NOT pretend still-active customers churned):
  * customer order-lifetime in 30-day months, a customer whose last
  * order falls within 180 days of the observation end is CENSORED
  * (we only know they survived at least that long), and
  * S(t) = Π_{s≤t} (1 − d_s/n_s) over the risk table.
  *
  * Scale shape: the fact collapses to one (first, last) row per
  * customer in ONE map-side-combined exchange; the observation end is
  * a one-row scalar aggregate CROSS-JOINED back (broadcast — not a
  * global window over the per-customer frame, which would single-
  * partition a 100 TB-scale frame); the risk table is a second
  * bounded aggregate (rows = distinct lifetime months, ≤ the calendar
  * span / 30) and every window runs over THAT bounded frame.
  *
  * Determinism: d/c/n_at_risk are exact integers. The survival
  * product is computed as exp(Σ ln(1 − d_t/n_t)) with each ln term
  * QUANTIZED to DECIMAL(18,6) before an exact decimal running sum
  * (the q129/q131 rule — quantize the few-distinct-values libm
  * surface, sum exactly), one final exp of bit-identical operands,
  * and round-4 of a continuous value (the q11 libm rule; never
  * round an exact decimal sum). A month where everyone at risk
  * churns (d = n) sends S to exactly 0.0 from there on — guarded
  * explicitly, since ln(0) is −∞.
  */
object Survival {

  /** Kaplan-Meier risk table + survival curve over one row per
    * subject: integral `durCol` (time bucket of the terminal
    * observation) and boolean `churnCol` (true = the churn event was
    * observed, false = right-censored). Factored so the spec can pin
    * the textbook worked example and the d = n collapse.
    */
  def km(durations: DataFrame, durCol: String, churnCol: String): DataFrame = {
    val perT = durations
      .groupBy(col(durCol).cast("long").as("t"))
      .agg(
        sum(when(col(churnCol), 1L).otherwise(0L)).as("d"),
        sum(when(col(churnCol), 0L).otherwise(1L)).as("c"))
    // All windows below run over the bounded risk-table frame only.
    val ord    = Window.orderBy(col("t"))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val run    = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole  = Window.partitionBy()
    perT
      .withColumn("n_at_risk",
        sum(col("d") + col("c")).over(whole) -
          coalesce(sum(col("d") + col("c")).over(before), lit(0L)))
      .withColumn("graft_term",
        when(col("d") < col("n_at_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_at_risk").cast("double"))
            .cast(det.D18_6)))
      .withColumn("graft_dead",
        max(when(col("d") >= col("n_at_risk"), 1).otherwise(0)).over(run))
      .withColumn("surv",
        when(col("graft_dead") === 1, lit(0.0))
          .otherwise(round(exp(sum(col("graft_term")).over(run).cast("double")), 4)))
      .select(col("t"), col("n_at_risk"), col("d"), col("c"), col("surv"))
  }

  val q142 = Q.of(
    "q142_survival_km",
    """WITH per_cust AS (
      |  SELECT o_custkey,
      |    CAST(MIN(o_orderdate) AS DATE) AS f,
      |    CAST(MAX(o_orderdate) AS DATE) AS l
      |  FROM orders GROUP BY 1
      |), obs AS (
      |  SELECT MAX(l) AS obs_end FROM per_cust
      |), durs AS (
      |  SELECT CAST(FLOOR(datediff('day', f, l) / 30) AS BIGINT) AS t,
      |    l <= obs_end - INTERVAL 180 DAY AS churned
      |  FROM per_cust, obs
      |), per_t AS (
      |  SELECT t,
      |    SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS d,
      |    SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS c
      |  FROM durs GROUP BY 1
      |), risk AS (
      |  SELECT t, d, c,
      |    SUM(d + c) OVER () -
      |      COALESCE(SUM(d + c) OVER (ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
      |  FROM per_t
      |), terms AS (
      |  SELECT t, n_at_risk, d, c,
      |    CASE WHEN d < n_at_risk THEN
      |      CAST(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE))
      |        AS DECIMAL(18,6)) END AS term,
      |    MAX(CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END) OVER
      |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
      |  FROM risk
      |)
      |SELECT t,
      |  CAST(n_at_risk AS BIGINT) AS n_at_risk,
      |  CAST(d AS BIGINT) AS d,
      |  CAST(c AS BIGINT) AS c,
      |  CASE WHEN dead = 1 THEN 0.0 ELSE
      |    round(exp(CAST(SUM(term) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 4)
      |  END AS surv
      |FROM terms
      |ORDER BY t""".stripMargin) { t =>
    val perCust = t.orders
      .groupBy(col("o_custkey"))
      .agg(to_date(min(col("o_orderdate"))).as("f"),
        to_date(max(col("o_orderdate"))).as("l"))
    // max(last order per customer) == max(order date): take it from a
    // direct min/max scan (footer-stats shaped at 100 TB) instead of
    // re-running perCust's customer exchange a second time
    val obsEnd = t.orders.agg(to_date(max(col("o_orderdate"))).as("obs_end"))
    val durs = perCust.crossJoin(broadcast(obsEnd))
      .select(
        floor(datediff(col("l"), col("f")) / lit(30)).cast("long").as("dur_m"),
        (col("l") <= date_sub(col("obs_end"), 180)).as("churned"))
    km(durs, "dur_m", "churned").orderBy(col("t"))
  }

  def all: Seq[Q] = Seq(q142)
}
