package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.BitmapAlgebra

/** q176 bitmap-algebra retention: hand-built period membership with
  * known retained/new/churned, a bucket-boundary key straddle, and
  * the inclusion-exclusion identities.
  */
class BitmapAlgebraSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def retention(rows: Seq[(Long, Long)]) = {
    val df = spark.createDataFrame(
      rows.map { case (p, c) => Row(p, c) }.asJava,
      StructType.fromDDL("p LONG, c LONG"))
    BitmapAlgebra.retention(df, "p", "c")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("q176 hand-built membership: exact retained / new / churned") {
    // month 1: {1,2,3}; month 2: {2,3,4,5}; month 3: {5}
    val out = retention(Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 2L), (2L, 3L), (2L, 4L), (2L, 5L),
      (3L, 5L)))
    assert(out.keySet == Set(2L, 3L)) // only months with a predecessor
    assert(out(2L) == ((4L, 2L, 2L, 1L))) // active 4, kept {2,3}, new {4,5}, lost {1}
    assert(out(3L) == ((1L, 1L, 0L, 3L))) // active 1, kept {5}, lost {2,3,4}
  }

  test("q176 duplicate presence rows collapse before the bitmaps") {
    val out = retention(Seq(
      (1L, 7L), (1L, 7L), (1L, 7L), (2L, 7L), (2L, 7L)))
    assert(out(2L) == ((1L, 1L, 0L, 0L)))
  }

  test("q176 keys straddling a bitmap bucket boundary stay distinct") {
    // positions 32768 and 32769 land in different buckets; disjoint
    // membership across the straddle must not collide
    val out = retention(Seq(
      (1L, 32768L), (1L, 32769L), (2L, 32769L), (2L, 32770L)))
    assert(out(2L) == ((2L, 1L, 1L, 1L))) // kept {32769}
  }

  test("q176 identities hold on a fixed random panel") {
    val rnd = new scala.util.Random(20260815L)
    val rows = for {
      p <- 1L to 5L
      c <- 1L to 200L
      if rnd.nextDouble() < 0.3
    } yield (p, c)
    val byP = rows.groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).toSet }
    val out = retention(rows)
    for (p <- 2L to 5L) {
      val (act, ret, fresh, lost) = out(p)
      assert(act == byP(p).size)
      assert(ret == (byP(p) intersect byP(p - 1)).size)
      assert(fresh == (byP(p) diff byP(p - 1)).size)
      assert(lost == (byP(p - 1) diff byP(p)).size)
      assert(act == ret + fresh && byP(p - 1).size == ret + lost)
    }
  }
}
