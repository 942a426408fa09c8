package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.operators.AsofJoin
import graft.queries.Histogram

/** Behavioral checks for `AsofJoin.forward` (q146's operator) and
  * q147's equi-width histogram: >= tie semantics at equal instants,
  * earliest-wins among several following right rows, LEFT semantics
  * for unmatched rows, key isolation; exact bucket-edge landings, the
  * max-value clamp, and empty-bucket spine presence.
  */
class ForwardAsofSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def fwd(left: Seq[(String, Long)], right: Seq[(String, Long, String)]) =
    AsofJoin.forward(
      df("k STRING, t TIMESTAMP")(left.map { case (k, s) => Row(k, ts(s)) }),
      df("k STRING, rt TIMESTAMP, payload STRING")(
        right.map { case (k, s, p) => Row(k, ts(s), p) }),
      "k", "t", "rt")

  test("forward asof picks the EARLIEST right row at-or-after each left row") {
    val out = fwd(
      left = Seq(("a", 10L)),
      right = Seq(("a", 5L, "before"), ("a", 20L, "first-after"), ("a", 30L, "later")))
      .collect().head
    assert(out.getAs[String]("payload") == "first-after")
    assert(out.getAs[Timestamp]("rt") == ts(20L))
  }

  test("forward asof matches a same-instant right row (>= semantics)") {
    val out = fwd(
      left = Seq(("a", 10L)),
      right = Seq(("a", 10L, "same-instant")))
      .collect().head
    assert(out.getAs[String]("payload") == "same-instant")
  }

  test("forward asof leaves unmatched left rows null (LEFT semantics) and keys isolated") {
    val out = fwd(
      left = Seq(("a", 10L), ("b", 10L)),
      right = Seq(("a", 5L, "past-only"), ("b", 15L, "b-future")))
      .collect().map(r => r.getAs[String]("k") -> Option(r.getAs[String]("payload"))).toMap
    assert(out("a").isEmpty)           // only right row is strictly before
    assert(out("b").contains("b-future")) // b's row never leaks to a
  }

  test("forward asof serves many left rows from one right row") {
    val out = fwd(
      left = Seq(("a", 1L), ("a", 2L), ("a", 3L)),
      right = Seq(("a", 5L, "shared")))
      .collect()
    assert(out.length == 3 && out.forall(_.getAs[String]("payload") == "shared"))
  }

  test("forward asof drops null right times instead of matching them") {
    val left = df("k STRING, t TIMESTAMP")(Seq(Row("a", ts(10L))))
    val right = df("k STRING, rt TIMESTAMP, payload STRING")(
      Seq(Row("a", null, "null-time")))
    val out = AsofJoin.forward(left, right, "k", "t", "rt").collect().head
    assert(out.getAs[String]("payload") == null)
  }

  // ---- q147: histogram ----

  test("q147 exact edges, max clamp, and empty buckets") {
    // values 0..10 with nothing in (2, 8): lo=0, hi=10, 20 buckets of 0.5
    val out = Histogram.histogram(
      df("v DOUBLE")(Seq(0.0, 0.5, 1.0, 2.0, 8.0, 10.0).map(Row(_))), "v")
      .orderBy("bucket").collect()
    assert(out.length == 20)
    val byBucket = out.map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n")).toMap
    // exact edge landings go UP: 0.5 → bucket 1, 1.0 → bucket 2, 2.0 → bucket 4
    assert(byBucket(0L) == 1L && byBucket(1L) == 1L && byBucket(2L) == 1L)
    assert(byBucket(4L) == 1L && byBucket(16L) == 1L)
    // hi lands in the LAST bucket, not a phantom 21st
    assert(byBucket(19L) == 1L)
    // everything else empty but present
    assert(byBucket.values.sum == 6L)
    val b0 = out.head
    assert(b0.getAs[Double]("edge_lo") == 0.0 && b0.getAs[Double]("edge_hi") == 0.5)
    assert(out.last.getAs[Double]("edge_hi") == 10.0)
  }

  test("q147 mass sums to the exact total") {
    val vals = Seq(1.25, 2.5, 3.75, 5.0, 6.25)
    val out = Histogram.histogram(df("v DOUBLE")(vals.map(Row(_))), "v").collect()
    assert(out.map(_.getAs[Double]("mass")).sum == vals.sum)
    assert(out.map(_.getAs[Long]("n")).sum == vals.length.toLong)
  }
}
