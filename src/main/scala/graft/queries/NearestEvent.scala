package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q231: NEAREST-EVENT JOIN — for every purchase, the temporally
  * CLOSEST click by the same user in EITHER direction. Completes the
  * as-of family: q35 joins backward (last state at or before t), q146
  * joins forward (next event after t); the nearest join is the
  * bidirectional member (attribution and root-cause tooling both ask
  * "which interaction sits closest to this conversion", not "which
  * side of it"). Ties at equal distance resolve to the EARLIER click
  * (the attribution convention: precede beats follow).
  *
  * Implemented as one merge-shaped pass, not two as-of joins: both
  * event types sort once per user on (ts, event_id); the previous
  * click rides a running `last(_, ignoreNulls)` over the preceding
  * frame and the next click a `first(_, ignoreNulls)` over the
  * following frame — the same sort serves both directions, so the
  * cost is ONE per-user window over clicks+purchases (at 100 TB this
  * is a user-partitioned sort, never a cross-type join; per-user
  * event counts bound the window state).
  *
  * Determinism: timestamps compare as exact int64 micros
  * (unix_micros ≡ epoch_us); deltas, the min, and the direction CASE
  * are pure integer arithmetic — no floats anywhere. The window
  * order (ts, event_id) is total, so a click sharing a purchase's
  * timestamp lands on a fixed side on both engines.
  */
object NearestEvent {

  val q231 = Q.of(
    "q231_nearest_join",
    """WITH ev AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
      |  FROM events WHERE event_type IN ('purchase', 'click')
      |), w AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    LAST_VALUE(click_us IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_us,
      |    FIRST_VALUE(click_us IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_us
      |  FROM ev
      |)
      |SELECT event_id, user_id, ts,
      |  epoch_us(ts) - prev_us AS before_us,
      |  next_us - epoch_us(ts) AS after_us,
      |  CASE
      |    WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
      |    WHEN next_us IS NULL THEN epoch_us(ts) - prev_us
      |    WHEN prev_us IS NULL THEN next_us - epoch_us(ts)
      |    WHEN epoch_us(ts) - prev_us <= next_us - epoch_us(ts)
      |      THEN epoch_us(ts) - prev_us
      |    ELSE next_us - epoch_us(ts) END AS nearest_us,
      |  CASE
      |    WHEN prev_us IS NULL AND next_us IS NULL THEN 'none'
      |    WHEN next_us IS NULL THEN 'before'
      |    WHEN prev_us IS NULL THEN 'after'
      |    WHEN epoch_us(ts) - prev_us <= next_us - epoch_us(ts)
      |      THEN 'before'
      |    ELSE 'after' END AS nearest_side
      |FROM w WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin) { t =>
    nearest(t.events)
  }

  /** The nearest-click plan over an events-shaped frame. Factored so
    * the spec can pin the tie (equal distance → before), the one-sided
    * cases, and the no-click 'none' row on hand fixtures.
    */
  def nearest(events: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val ev = events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "click", unix_micros(col("ts")))
          .as("click_us"))
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val w = ev.select(col("event_id"), col("user_id"), col("ts"),
      col("event_type"),
      last(col("click_us"), ignoreNulls = true)
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("prev_us"),
      first(col("click_us"), ignoreNulls = true)
        .over(order.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .as("next_us"))
    val tUs = unix_micros(col("ts"))
    val before = tUs - col("prev_us")
    val after = col("next_us") - tUs
    w.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        before.as("before_us"), after.as("after_us"),
        when(col("prev_us").isNull && col("next_us").isNull, lit(null))
          .when(col("next_us").isNull, before)
          .when(col("prev_us").isNull, after)
          .when(before <= after, before)
          .otherwise(after).as("nearest_us"),
        when(col("prev_us").isNull && col("next_us").isNull, lit(null))
          .when(col("next_us").isNull, lit("before"))
          .when(col("prev_us").isNull, lit("after"))
          .when(before <= after, lit("before"))
          .otherwise(lit("after")).as("nearest_side"))
      .orderBy(col("event_id"))
  }

  def all: Seq[Q] = Seq(q231)
}
