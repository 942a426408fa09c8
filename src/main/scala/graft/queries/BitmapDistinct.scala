package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q162: BITMAP-EXACT mergeable distinct counts — the EXACT
  * counterpart of q100's HLL tier: per order-month, distinct
  * customers via Spark's bitmap aggregate family
  * (`bitmap_bucket_number` / `bitmap_bit_position` /
  * `bitmap_construct_agg` / `bitmap_count`). Where `count_distinct`
  * holds the whole key set in its aggregation state (unmergeable
  * without re-scanning), the bitmap PARTIAL per (month, bucket) is a
  * fixed 4 KB bit vector covering 32 768 key positions — mergeable
  * state an incremental pipeline (q96) can store, OR together across
  * refreshes, and count exactly: exact answers with sketch-shaped
  * plumbing, the right tool when keys are dense integers (HLL stays
  * the answer for open domains — the documented trade).
  *
  * Scale shape: level 1 is a map-side-combined (month, bucket)
  * aggregate whose state is the fixed-size bitmap (buckets =
  * ⌈keyspace/32768⌉, data-bounded); level 2 folds `bitmap_count` of
  * each partial — a SUM over the bounded bucket frame, because
  * bucket ranges partition the keyspace so no key spans buckets.
  * The oracle is the one-pass COUNT(DISTINCT) spelling — exactness
  * of the whole bitmap path IS the compare.
  */
object BitmapDistinct {

  /** Exact distinct `keyCol` per `grpCol` via two-level bitmap
    * merge, with the partial-state count exposed. Factored so the
    * spec can pin bucket-boundary keys and merge associativity.
    */
  def bitmapDistinct(df: DataFrame, grpCol: String, keyCol: String): DataFrame = {
    df
      .select(col(grpCol),
        expr(s"bitmap_bucket_number($keyCol)").as("graft_bucket"),
        expr(s"bitmap_bit_position($keyCol)").as("graft_pos"))
      .groupBy(col(grpCol), col("graft_bucket"))
      .agg(expr("bitmap_construct_agg(graft_pos)").as("graft_bm"))
      .groupBy(col(grpCol))
      .agg(
        sum(expr("bitmap_count(graft_bm)")).as("n_distinct"),
        count(lit(1)).as("n_buckets"))
  }

  val q162 = Q.of(
    "q162_bitmap_distinct",
    """SELECT date_trunc('month', o_orderdate) AS month,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
      |  CAST(COUNT(DISTINCT CASE WHEN o_custkey > 0
      |    THEN (o_custkey - 1) // 32768 + 1 ELSE o_custkey // 32768 END)
      |    AS BIGINT) AS n_buckets
      |FROM orders
      |GROUP BY 1
      |ORDER BY month""".stripMargin) { t =>
    bitmapDistinct(
      t.orders.select(
        date_trunc("month", col("o_orderdate")).as("month"), col("o_custkey")),
      "month", "o_custkey")
      .orderBy(col("month"))
  }

  def all: Seq[Q] = Seq(q162)
}
