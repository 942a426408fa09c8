package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — attach to each left row the single most
  * recent right row with `rightTime <= leftTime` for the same key
  * (the temporal-join primitive Spark lacks as a built-in; the
  * reference's date-window joins express "state at event time" the
  * same way, e.g. /root/reference/SQL/Subscription Upgrade-Downgrade
  * Patterns.txt pairing each change with the previous plan row).
  *
  * Plan shape (SURVEY §5): NO join at all — the two inputs are
  * union'd, hash-partitioned by key ONCE, and sorted by (time, side)
  * so a running `last(payload, ignoreNulls)` window carries each right
  * row's payload forward to every left row until the next right row.
  * This is the kdb/Flink merge-asof as one exchange + one sort: cost
  * is linear in |left| + |right| regardless of how many left rows each
  * right row serves, where a range-predicate join would blow up as the
  * per-key cross product.
  *
  * The payload travels as ONE struct column, filled by a single
  * window expression — so a right row whose individual field is null
  * still supersedes older rows atomically (per-column fills would
  * stitch fields from different right rows), and the plan carries one
  * Window operator with one exchange.
  *
  * Contract: `left` and `right` share the key column name; every
  * right column except the key is payload and lands on matched left
  * rows (unmatched left rows keep them null — LEFT ASOF semantics;
  * filter on the time payload for inner). Right rows must be unique
  * per (key, rightTime) — pre-dedupe ties upstream, or the fill order
  * between equal-time right rows is unspecified. Ties between a left
  * and a right row at the same instant match (<=: right sorts first).
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val payload = right.columns.filter(_ != keyCol).toSeq
    require(!payload.exists(left.columns.contains),
      s"left already has right payload columns: ${payload.filter(left.columns.contains).mkString(",")}")
    val internal = Seq("graft_t", "graft_side", "graft_payload")
    val clash = internal.filter(c => left.columns.contains(c) || right.columns.contains(c))
    require(clash.isEmpty,
      s"inputs must not contain the asof-join internal columns: ${clash.mkString(",")}")
    val l = left
      .withColumn("graft_t", col(leftTimeCol))
      .withColumn("graft_side", lit(1))
    // a null right time cannot match any left row under `rightTime <=
    // leftTime`, but NULLS FIRST ordering would sort it before every
    // real row and carry its payload forward — drop such rows up front
    val r = right
      .filter(col(rightTimeCol).isNotNull)
      .withColumn("graft_t", col(rightTimeCol))
      .withColumn("graft_side", lit(0))
      .withColumn("graft_payload", struct(payload.map(col): _*))
      .drop(payload: _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("graft_t"), col("graft_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("graft_payload", last(col("graft_payload"), ignoreNulls = true).over(w))
      .filter(col("graft_side") === 1)
      .select(left.columns.map(col).toIndexedSeq ++
        payload.map(c => col(s"graft_payload.$c").as(c)): _*)
  }

  /** Forward as-of join — attach to each left row the single EARLIEST
    * right row with `rightTime >= leftTime` for the same key (the
    * time-to-next-event direction: next error after a purchase, next
    * quote after an order). Same union-merge plan as [[backward]] —
    * one exchange, one sort, a `first(payload, ignoreNulls)` window
    * over the FOLLOWING frame — with the tie order flipped: at equal
    * instants the left row sorts BEFORE the right row, so a same-time
    * right row is inside the left row's frame and matches (>=).
    */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val payload = right.columns.filter(_ != keyCol).toSeq
    require(!payload.exists(left.columns.contains),
      s"left already has right payload columns: ${payload.filter(left.columns.contains).mkString(",")}")
    val internal = Seq("graft_t", "graft_side", "graft_payload")
    val clash = internal.filter(c => left.columns.contains(c) || right.columns.contains(c))
    require(clash.isEmpty,
      s"inputs must not contain the asof-join internal columns: ${clash.mkString(",")}")
    val l = left
      .withColumn("graft_t", col(leftTimeCol))
      .withColumn("graft_side", lit(0))
    // a null right time cannot satisfy `rightTime >= leftTime`; NULLS
    // LAST would park it at the frame end where first(ignoreNulls)
    // could still pick it up — drop such rows up front
    val r = right
      .filter(col(rightTimeCol).isNotNull)
      .withColumn("graft_t", col(rightTimeCol))
      .withColumn("graft_side", lit(1))
      .withColumn("graft_payload", struct(payload.map(col): _*))
      .drop(payload: _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("graft_t"), col("graft_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("graft_payload", first(col("graft_payload"), ignoreNulls = true).over(w))
      .filter(col("graft_side") === 0)
      .select(left.columns.map(col).toIndexedSeq ++
        payload.map(c => col(s"graft_payload.$c").as(c)): _*)
  }
}
