package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval join — pair each left "point" row with every
  * right interval [start, end] that contains it, WITHOUT a range-only
  * join condition (which Spark can only execute as a broadcast
  * nested-loop / cartesian scan: O(|left|·|right|) comparisons).
  *
  * Plan shape (SURVEY §5): intervals explode into the fixed-width
  * buckets they overlap (⌈span/width⌉ + 1 rows each), points map to
  * their single bucket, and the match becomes a hash EQUI-join on
  * bucket id with an exact residual filter — shuffle volume is
  * |left| + |right|·avg_buckets, comparisons only within co-bucketed
  * pairs. Pick `bucketWidth` ≈ the typical interval span so each
  * interval lands in ~2 buckets; a width far below the span multiplies
  * the right side, far above it degrades toward all-pairs within a
  * bucket (same trade every interval-index makes).
  *
  * Domain is numeric (long) — convert timestamps with unix_micros /
  * epoch days upstream. Bounds are inclusive on both ends; express
  * half-open intervals by passing end-1.
  */
object RangeJoin {

  def pointInInterval(left: DataFrame, pointCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("graft_bucket",
      expr(s"$pointCol div $bucketWidth"))
    val r = right.withColumn("graft_bucket",
      explode(sequence(expr(s"$startCol div $bucketWidth"),
        expr(s"$endCol div $bucketWidth"))))
    l.join(r, "graft_bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("graft_bucket")
  }
}
