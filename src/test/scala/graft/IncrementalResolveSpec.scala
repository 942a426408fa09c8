package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.IncrementalResolve

/** q259/q260 cluster maintenance: the BRIDGE case (a delta doc whose
  * prefix matches one base cluster and suffix another MERGES them —
  * the case the synthetic corpus never produces, so the oracle gate
  * alone can't exercise it), absorbed-count arithmetic, singleton
  * emission, and the quality-survivor argmax + tie rule.
  */
class IncrementalResolveSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docs(rows: Seq[(Long, String, String, Long)]) =
    spark.createDataFrame(
      rows.map { case (id, text, src, n) => Row(id, text, src, n) }.asJava,
      StructType.fromDDL(
        "doc_id BIGINT, text STRING, source STRING, n_chars BIGINT"))

  test("q259 delta doc bridges two base clusters via prefix+suffix") {
    // base cluster A: docs 1, 3 share prefix p1..p4
    // base cluster B: docs 2, 4 share suffix y1..y4
    // delta doc 5 carries A's prefix AND B's suffix -> one merged
    // cluster of 5 docs absorbing 2 base clusters
    val d = docs(Seq(
      (1L, "p1 p2 p3 p4 ax1 ax2 ax3 ax4 ax5", "s", 10L),
      (3L, "p1 p2 p3 p4 bx1 bx2 bx3 bx4 bx5", "s", 10L),
      (2L, "u1 u2 u3 u4 mid y1 y2 y3 y4", "s", 10L),
      (4L, "v1 v2 v3 v4 mid y1 y2 y3 y4", "s", 10L),
      (5L, "p1 p2 p3 p4 zz y1 y2 y3 y4", "s", 10L),
      // delta singleton: unique content
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8", "s", 8L),
      // delta too short for keys -> singleton
      (15L, "t1 t2", "s", 2L)))
    val out = IncrementalResolve.incrementalClusters(d, 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((5L, 1L, 2L)),
      s"bridge cluster must hold 5 docs, 1 delta, 2 absorbed base clusters: $out")
    assert(out(10L) == ((1L, 1L, 0L)), s"keyed singleton: $out")
    assert(out(15L) == ((1L, 1L, 0L)), s"short-doc singleton: $out")
    assert(out.size == 3, s"exactly three delta-containing clusters: $out")
  }

  test("q259 untouched base clusters never appear") {
    val d = docs(Seq(
      (1L, "p1 p2 p3 p4 a b c d e", "s", 9L),
      (3L, "p1 p2 p3 p4 f g h i j", "s", 9L),
      // delta shares nothing with the base cluster
      (5L, "n1 n2 n3 n4 n5 n6 n7 n8", "s", 8L)))
    val out = IncrementalResolve.incrementalClusters(d, 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(5L -> ((1L, 1L, 0L))),
      s"the untouched base cluster leaked into the delta report: $out")
  }

  test("q259 delta joining ONE base cluster absorbs exactly it") {
    val d = docs(Seq(
      (1L, "p1 p2 p3 p4 a b c d e", "s", 9L),
      (3L, "p1 p2 p3 p4 f g h i j", "s", 9L),
      (6L, "k1 k2 k3 k4 m n o p q", "s", 9L), // unrelated base
      (5L, "p1 p2 p3 p4 z z2 z3 z4 z5", "s", 9L)))
    val out = IncrementalResolve.incrementalClusters(d, 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(1L -> ((3L, 1L, 1L))), s"$out")
  }

  test("q260 survivor is the longest doc; ties break to the lowest id") {
    val d = docs(Seq(
      (1L, "p1 p2 p3 p4 a", "alpha", 100L),
      (2L, "p1 p2 p3 p4 b", "beta", 300L), // survivor: most chars
      (3L, "p1 p2 p3 p4 c", "alpha", 300L), // same chars, higher id -> dropped
      (7L, "solo1 solo2 solo3 solo4", "alpha", 50L))) // singleton: kept
    val out = IncrementalResolve.qualitySurvivors(d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out("beta") == ((1L, 1L, 0L, 300L, 0L)), s"$out")
    assert(out("alpha") == ((3L, 1L, 2L, 50L, 400L)),
      s"alpha keeps only the singleton; 1 and 3 drop: $out")
  }
}
