package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.AsofJoin

/** q146: FORWARD as-of join — time-to-next-incident attribution: for
  * every purchase, the EARLIEST error by the same user at or after
  * the purchase instant, rolled up per user (purchase count, matched
  * count, mean/max latency). q35/q108 cover the backward direction
  * ("state at event time"); this is the other temporal-join arrow
  * ("what happened next") that SLA/incident/conversion-latency
  * analyses need, via `operators/AsofJoin.forward`.
  *
  * Plan shape: the operator's union-merge — purchases and errors are
  * union'd, hash-partitioned by user ONCE, sorted by (time, side)
  * with the left row FIRST at equal instants (so a same-instant error
  * matches, >= semantics), and a `first(payload, ignoreNulls)` window
  * over the FOLLOWING frame carries each error backward to every
  * earlier purchase — NO join node, cost linear in |purchases| +
  * |errors| however many purchases each error serves. The oracle is
  * the structurally different single-table window spelling.
  *
  * Determinism: latencies are exact integer micros; the mean is one
  * IEEE division of exact integers, guarded to NULL when a user has
  * no matched purchase (so neither engine's divide-by-zero convention
  * is in play).
  */
object NextEvent {

  val q146 = Q.of(
    "q146_asof_forward",
    """WITH seq AS (
      |  SELECT user_id, event_type, ts,
      |    MIN(CASE WHEN event_type = 'error' THEN ts END) OVER (
      |      PARTITION BY user_id
      |      ORDER BY ts, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS err_ts
      |  FROM events WHERE event_type IN ('purchase', 'error')
      |)
      |SELECT user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(COUNT(err_ts) AS BIGINT) AS n_matched,
      |  CASE WHEN COUNT(err_ts) > 0 THEN
      |    CAST(SUM(epoch_us(err_ts) - epoch_us(ts)) AS DOUBLE) / COUNT(err_ts)
      |  END AS avg_latency_us,
      |  CAST(MAX(epoch_us(err_ts) - epoch_us(ts)) AS BIGINT) AS max_latency_us
      |FROM seq WHERE event_type = 'purchase'
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { t =>
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    val errors = t.events.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"))
    val lat = unix_micros(col("err_ts")) - unix_micros(col("ts"))
    AsofJoin.forward(purchases, errors, "user_id", "ts", "err_ts")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("err_ts")).as("n_matched"),
        when(count(col("err_ts")) > 0,
          sum(lat).cast("double") / count(col("err_ts"))).as("avg_latency_us"),
        max(lat).as("max_latency_us"))
      .orderBy(col("user_id"))
  }

  def all: Seq[Q] = Seq(q146)
}
