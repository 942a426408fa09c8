package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.EquiDepth

/** q177 equi-depth histogram: hand-computed boundaries on skewed and
  * uniform distributions, a heavy value swallowing several
  * thresholds, and the n < k degenerate case.
  */
class EquiDepthSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def bounds(values: Seq[Long], k: Int) = {
    val df = spark.createDataFrame(
      values.map(Row(_)).asJava, StructType.fromDDL("v LONG"))
    EquiDepth.boundaries(df, "v", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("q177 uniform 1..8 into 4 buckets: boundaries at 2,4,6,8") {
    val out = bounds((1L to 8L), 4)
    assert(out == Map(
      1L -> ((2L, 2L, 2L)), 2L -> ((4L, 4L, 4L)),
      3L -> ((6L, 6L, 6L)), 4L -> ((8L, 8L, 8L))))
  }

  test("q177 heavy value swallows several thresholds") {
    // 10 copies of value 5 then 1,2: n=12, k=4, thr = 3,6,9,12
    val out = bounds(Seq.fill(10)(5L) ++ Seq(1L, 2L), 4)
    // cum: 1->1, 2->2, 5->12; value 5 satisfies thr 3, 6, 9, 12
    assert(out(1L) == ((5L, 12L, 3L)))
    assert(out(2L) == ((5L, 12L, 6L)))
    assert(out(3L) == ((5L, 12L, 9L)))
    assert(out(4L) == ((5L, 12L, 12L)))
  }

  test("q177 skewed hand case: uneven thresholds land mid-cell") {
    // values 1x3, 2x1, 3x1: n=5, k=2, thr = ceil(5/2)=3, 5
    val out = bounds(Seq(1L, 1L, 1L, 2L, 3L), 2)
    assert(out(1L) == ((1L, 3L, 3L))) // cum(1)=3 >= 3
    assert(out(2L) == ((3L, 5L, 5L)))
  }

  test("q177 n < k: every row is its own boundary, k capped") {
    // n=2, k=8: thr_i = ceil(2i/8) -> 1,1,1,1,2,2,2,2
    val out = bounds(Seq(10L, 20L), 8)
    assert((1L to 4L).forall(i => out(i) == ((10L, 1L, 1L))))
    assert((5L to 8L).forall(i => out(i) == ((20L, 2L, 2L))))
  }

  test("q177 buckets hold ~n/k mass: exact rank semantics on a fixed random set") {
    val rnd = new scala.util.Random(20260815L)
    val values = Seq.fill(500)(rnd.nextInt(40).toLong + 1)
    val k = 8
    val out = bounds(values, k)
    val sorted = values.sorted
    for (i <- 1 to k) {
      val thr = ((i * values.size) + k - 1) / k
      assert(out(i.toLong)._1 == sorted(thr - 1)) // boundary = value at rank thr
      assert(out(i.toLong)._3 == thr)
    }
  }
}
