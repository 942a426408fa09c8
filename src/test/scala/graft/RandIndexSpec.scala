package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.RandIndex

/** q273 blocking-agreement ARI: identical partitions, crossed
  * (independent) partitions, a hand-computed contingency, and the
  * degenerate all-singleton guard.
  */
class RandIndexSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def keys(rows: Seq[(String, String)]) =
    spark.createDataFrame(
      rows.map { case (a, b) => Row(a, b) }.asJava,
      StructType.fromDDL("ka STRING, kb STRING"))

  test("identical partitions score ARI = 1000") {
    val r = RandIndex.fromKeys(keys(Seq(
      "x" -> "x", "x" -> "x", "y" -> "y", "y" -> "y", "z" -> "z")))
      .collect().head
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) === 2L)            // X = C(2,2)+C(2,2)
    assert(r.getLong(5) === 1000L)         // rand_pm
    assert(r.getLong(6) === 1000L)         // ari_abs_pm
    assert(r.getLong(7) === 1L)
  }

  test("hand-computed crossed 2x2 contingency") {
    // A splits {1,2}/{3,4}; B splits {1,3}/{2,4}: X=0, A=B=2, T=6
    // rand = (6-2-2+0)/6 = 1/3 -> 333; ARI num = 2(0*6-4) = -8,
    // den = 6*4-8 = 16 -> |ARI| = 500, sign -1
    val r = RandIndex.fromKeys(keys(Seq(
      "a1" -> "b1", "a1" -> "b2", "a2" -> "b1", "a2" -> "b2")))
      .collect().head
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === 2L)
    assert(r.getLong(3) === 2L)
    assert(r.getLong(4) === 6L)
    assert(r.getLong(5) === 333L)
    assert(r.getLong(6) === 500L)
    assert(r.getLong(7) === -1L)
  }

  test("all-singleton partitions hit the denominator guard") {
    val r = RandIndex.fromKeys(keys(Seq(
      "a" -> "p", "b" -> "q", "c" -> "r"))).collect().head
    assert(r.getLong(5) === 1000L)  // every pair apart in both
    assert(r.getLong(6) === 1000L)  // pinned by convention
  }

  test("q273 on the corpus: sane ranges and pair-count consistency") {
    val r = run("q273_blocking_ari").collect().head
    val (n, x, a, b, t) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(t === n * (n - 1) / 2)
    assert(x <= math.min(a, b))
    assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000L)
    assert(r.getLong(6) >= 0L && r.getLong(6) <= 1000L)
  }
}
