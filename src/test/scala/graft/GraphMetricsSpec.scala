package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.Triangles

/** q170 triangle count / clustering coefficient: hand-built graphs
  * with known counts, the support gate, and a fixed-seed random
  * differential against brute-force enumeration.
  */
class GraphMetricsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def baskets(edges: Seq[(Long, Long)], copies: Int = 1) = {
    // one basket per edge (replicated `copies` times under distinct
    // container ids) produces exactly that co-occurrence graph
    val rows = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      (0 until copies).flatMap { c =>
        val ok = (i * 10 + c + 1).toLong
        Seq(Row(ok, a), Row(ok, b))
      }
    }
    spark.createDataFrame(rows.asJava, StructType.fromDDL("ok LONG, pk LONG"))
  }

  private def result(edges: Seq[(Long, Long)], minSupport: Int = 1, copies: Int = 1) =
    Triangles.perNode(baskets(edges, copies), "ok", "pk", minSupport)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("q170 triangle + pendant + square: hand-computed counts") {
    // triangle 1-2-3, pendant 3-4, square 5-6-7-8 (cycle, no diagonal)
    val g = result(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L)))
    assert(g(1L) == ((2L, 1L, 1.0)))
    assert(g(2L) == ((2L, 1L, 1.0)))
    assert(g(3L) == ((3L, 1L, 2.0 / 6.0)))
    assert(g(4L) == ((1L, 0L, 0.0))) // deg 1: cc pinned 0, not 0/0
    Seq(5L, 6L, 7L, 8L).foreach { n => assert(g(n) == ((2L, 0L, 0.0))) }
  }

  test("q170 support gate drops single-co-occurrence edges") {
    // all edges have support 1 -> pruned graph empty at minSupport 2
    assert(result(Seq((1L, 2L), (2L, 3L), (1L, 3L)), minSupport = 2).isEmpty)
    // replicated baskets pass the gate and the triangle reappears
    val g = result(Seq((1L, 2L), (2L, 3L), (1L, 3L)), minSupport = 2, copies = 2)
    assert(g(1L) == ((2L, 1L, 1.0)))
  }

  test("q170 matches brute-force enumeration on fixed random graphs") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 3) {
      val n = 24
      val edges = (for {
        a <- 1L to n
        b <- (a + 1) to n
        if rnd.nextDouble() < 0.22
      } yield (a, b)).toSeq
      val eset = edges.toSet
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val degRef = nodes.map(v =>
        v -> edges.count { case (a, b) => a == v || b == v }.toLong).toMap
      val triRef = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        (a, b) <- edges
        c <- nodes if c > b && eset.contains((b, c)) && eset.contains((a, c))
      } { triRef(a) += 1; triRef(b) += 1; triRef(c) += 1 }
      val got = result(edges)
      assert(got.keySet == degRef.keySet, s"trial $trial node set")
      got.foreach { case (v, (deg, nTri, cc)) =>
        assert(deg == degRef(v), s"trial $trial deg($v)")
        assert(nTri == triRef(v), s"trial $trial tri($v)")
        val want = if (deg >= 2) 2.0 * triRef(v) / (deg * (deg - 1.0)) else 0.0
        assert(cc == want, s"trial $trial cc($v)")
      }
    }
  }
}
