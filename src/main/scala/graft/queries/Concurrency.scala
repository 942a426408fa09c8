package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q134: INTERVAL CONCURRENCY by sweep line — "how many sessions were
  * active at once", the capacity-planning statistic q36's range JOIN
  * (pairwise overlap) cannot produce because peak concurrency is a
  * property of the whole arrangement, not of pairs: each event
  * becomes a [start, start + duration) interval, every interval
  * emits a +1 at its start and a −1 at its end, and the running sum
  * of deltas in time order IS the concurrency curve; its max is the
  * peak.
  *
  * Determinism: the sweep runs on INTEGER microseconds
  * (`unix_micros(ts)` / DuckDB `epoch_us`) with integer-floored
  * durations — no timestamp/interval arithmetic, no floats anywhere.
  * Half-open semantics: at equal instants ends sort before starts
  * (delta ascending), so a back-to-back pair never counts as
  * concurrent; within an equal (t, delta) run the partial sums are
  * order-invariant (all deltas equal), so the curve — and every
  * window row — is deterministic without a unique tiebreak.
  *
  * Scale shape: deltas are a zero-shuffle explode projection; the
  * sweep is ONE window per user_id partition — per-group state
  * bounded by one user's event history (the q21/q124 bound; a GLOBAL
  * sweep would instead ride operators/PrefixSum's distributed
  * two-phase scan, the q80 machinery) — then a bounded user-grain
  * rollup.
  */
object Concurrency {

  /** Per-user peak/ever-concurrent stats over [us, us+dur_us)
    * intervals. Factored so the spec can pin hand-built arrangements
    * (nested, chained, back-to-back-touching intervals).
    */
  def userConcurrency(intervals: DataFrame): DataFrame = {
    val deltas = intervals
      .select(col("user_id"), explode(array(
        struct(col("us").as("t"), lit(1).as("delta")),
        struct((col("us") + col("dur_us")).as("t"), lit(-1).as("delta")))).as("d"))
      .select(col("user_id"), col("d.t").as("t"), col("d.delta").as("delta"))
    val sweep = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("active", sum(col("delta")).over(sweep))
      .groupBy(col("user_id"))
      .agg(
        (count(lit(1)) / 2).cast("long").as("n_intervals"),
        max(col("active")).cast("long").as("peak_concurrent"),
        sum(when(col("active") >= 2 && col("delta") === 1, 1L).otherwise(0L))
          .as("n_overlapping_starts"))
  }

  val q134 = Q.of(
    "q134_interval_concurrency",
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    CAST(floor(value) AS BIGINT) * 1000000 AS dur_us
      |  FROM events WHERE value IS NOT NULL
      |), d AS (
      |  SELECT user_id, us AS t, 1 AS delta FROM iv
      |  UNION ALL SELECT user_id, us + dur_us, -1 FROM iv
      |), s AS (
      |  SELECT user_id, delta,
      |    SUM(delta) OVER (PARTITION BY user_id ORDER BY t, delta
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
      |  FROM d
      |)
      |SELECT user_id,
      |  CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals,
      |  CAST(MAX(active) AS BIGINT) AS peak_concurrent,
      |  CAST(SUM(CASE WHEN active >= 2 AND delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_overlapping_starts
      |FROM s
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { t =>
    userConcurrency(
      t.events.filter(col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          (floor(col("value")).cast("long") * 1000000L).as("dur_us")))
      .orderBy(col("user_id"))
  }

  def all: Seq[Q] = Seq(q134)
}
