package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q138: CUSUM CHANGEPOINT detection — the sequential level-shift
  * alarm (Page 1954, public) over daily event series: where q131
  * flags WHICH SOURCE drifted and q136 smooths noise away, CUSUM
  * answers WHEN a series changed level. The textbook recursion
  * S_t = max(0, S_{t−1} + (x_t − μ)) looks window-inexpressible, but
  * has the classic closed form S_t = cum_t − min(0, cum_1..cum_t)
  * over the centered running sum — a cumulative sum plus a running
  * minimum, two aggregates over ONE running frame of one window pass. Run in SCALED INTEGER
  * units (dev_t = n_t·D − T where D = #days, T = Σn, so Σdev = 0
  * exactly): no mean division, no floats anywhere, the report is
  * hash-exact by construction. Both one-sided statistics are emitted
  * (level-up peak and level-down peak) with their argmax days
  * (earliest day on ties — a deterministic tiebreak, not max_by).
  *
  * Scale shape: ONE map-side-combined daily pre-aggregate (output
  * bounded by types × days — the q136 bound; the fact is touched
  * exactly once), then all windows run over that bounded frame in a
  * single sort per type partition. At 100 TB the scaled products
  * stay in int64: dev ≤ n_max·D ≈ 10¹²·10⁴ only if a single type
  * logs a trillion events a day for 30 years — the documented
  * headroom, with DECIMAL(38,0) as the escape hatch.
  */
object Changepoint {

  /** Two-sided integer CUSUM peaks per `keyCol` over the `nCol`
    * series ordered by `dayCol`. Factored so the spec can pin a
    * hand-computed step-shift series and the flat-series zero.
    */
  def cusum(daily: DataFrame, keyCol: String, dayCol: String, nCol: String): DataFrame = {
    val p    = Window.partitionBy(col(keyCol))
    val ord  = p.orderBy(col(dayCol))
    val run  = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("d_days", count(lit(1)).over(p))
      .withColumn("total", sum(col(nCol)).over(p))
      .withColumn("dev", col(nCol) * col("d_days") - col("total"))
      .withColumn("cum", sum(col("dev")).over(run))
      .withColumn("s_pos", col("cum") - least(lit(0L), min(col("cum")).over(run)))
      .withColumn("s_neg", greatest(lit(0L), max(col("cum")).over(run)) - col("cum"))
      .withColumn("mxp", max(col("s_pos")).over(p))
      .withColumn("mxn", max(col("s_neg")).over(p))
    scored
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_days"),
        max(col("total")).as("total"),
        max(col("s_pos")).as("peak_up"),
        min(when(col("s_pos") === col("mxp"), col(dayCol))).as("day_up"),
        max(col("s_neg")).as("peak_down"),
        min(when(col("s_neg") === col("mxn"), col(dayCol))).as("day_down"))
  }

  val q138 = Q.of(
    "q138_cusum_changepoint",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2
      |), dev AS (
      |  SELECT event_type, day,
      |    COUNT(*) OVER p AS d_days,
      |    SUM(n) OVER p AS total,
      |    n * COUNT(*) OVER p - SUM(n) OVER p AS dev
      |  FROM daily
      |  WINDOW p AS (PARTITION BY event_type)
      |), scored AS (
      |  SELECT event_type, day, d_days, total,
      |    SUM(dev) OVER (PARTITION BY event_type ORDER BY day
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM dev
      |), s AS (
      |  SELECT event_type, day, d_days, total, cum,
      |    cum - LEAST(0, MIN(cum) OVER w) AS s_pos,
      |    GREATEST(0, MAX(cum) OVER w) - cum AS s_neg
      |  FROM scored
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), m AS (
      |  SELECT *, MAX(s_pos) OVER p AS mxp, MAX(s_neg) OVER p AS mxn
      |  FROM s WINDOW p AS (PARTITION BY event_type)
      |)
      |SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(MAX(total) AS BIGINT) AS total,
      |  CAST(MAX(s_pos) AS BIGINT) AS peak_up,
      |  MIN(CASE WHEN s_pos = mxp THEN day END) AS day_up,
      |  CAST(MAX(s_neg) AS BIGINT) AS peak_down,
      |  MIN(CASE WHEN s_neg = mxn THEN day END) AS day_down
      |FROM m
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { t =>
    cusum(
      t.events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")),
      "event_type", "day", "n")
      .orderBy(col("event_type"))
  }

  def all: Seq[Q] = Seq(q138)
}
