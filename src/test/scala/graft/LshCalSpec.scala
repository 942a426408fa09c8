package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{HyperplaneCal, KmeansAudit, SimhashCal}

/** q251 simhash calibration, q252 hyperplane calibration, q253
  * k-means convergence audit: closed-form fixtures plus real-corpus
  * calibration/descent properties. (The oracle gate proves the
  * DuckDB-replayability; these pin the semantics.)
  */
class LshCalSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docs(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      rows.map { case (id, text) => Row(id, text) }.asJava,
      StructType.fromDDL("doc_id BIGINT, text STRING"))

  private def vecs(rows: Seq[(Long, Seq[Double])]) =
    spark.createDataFrame(
      rows.map { case (id, v) => Row(id, v) }.asJava,
      StructType.fromDDL("vec_id BIGINT, v ARRAY<DOUBLE>"))

  test("q251 identical docs pair at hamming 0 with exact jaccard 1") {
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val out = SimhashCal.calibrate(docs(Seq((1L, text), (2L, text))))
      .collect()
    assert(out.length == 1, s"identical docs must band-collide once: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(0) == 0L, "identical docs have hamming 0")
    assert(r.getDouble(1) == 1.0, "est similarity 1")
    assert(r.getLong(2) == 1L && r.getDouble(3) == 1.0, "one pair, exact jaccard 1")
  }

  test("q251 estimator tracks exact jaccard on the real corpus") {
    val rows = run("q251_simhash_calibration").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(rows.nonEmpty)
    val sorted = rows.sortBy(_._1)
    // lowest-hamming bucket must carry at least the mean exact
    // similarity of the highest-hamming bucket
    assert(sorted.head._2 >= sorted.last._2,
      s"calibration inverted: ${sorted.toSeq}")
  }

  test("q252 identical vectors pair at agree 16 with cosine 1") {
    val v = (1 to 64).map(d => math.sin(d.toDouble))
    val w = (1 to 64).map(d => math.cos(d.toDouble * 1.7))
    val out = HyperplaneCal.calibrate(vecs(Seq((1L, v), (2L, v), (50L, w))))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.contains(16L), s"identical pair must fully agree: $out")
    val (est, n, mean) = out(16L)
    assert(est == 1.0 && n >= 1L)
    assert(math.abs(mean - 1.0) < 1e-4, s"identical pair cosine ~1, got $mean")
  }

  test("q252 plane agreement tracks cosine on the real embeddings") {
    val rows = run("q252_hyperplane_calibration").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(rows.nonEmpty)
    val sorted = rows.sortBy(_._1)
    // SRP guarantee: more agreeing planes => higher mean cosine
    assert(sorted.last._2 >= sorted.head._2,
      s"SRP calibration inverted: ${sorted.toSeq}")
  }

  test("q253 inertia is non-increasing across Lloyd rounds on the real embeddings") {
    val rows = run("q253_kmeans_audit").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val byRound = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    assert(byRound.size == 3, s"three rounds expected: $byRound")
    byRound.sliding(2).foreach { case Seq((r1, i1), (r2, i2)) =>
      assert(i2 <= i1,
        s"inertia must descend (round $r1: $i1 -> round $r2: $i2)")
    }
  }

  test("q253 identical-point clusters collapse to zero inertia") {
    // 8 copies of A (ids 0-7) then 8 copies of B: init centroids are
    // the 8 A-copies, so round 1 assigns EVERYTHING to k=0 (tie ->
    // lowest k) and the B half carries the full A-B distance; the
    // round-2 centroid is the A/B midpoint; by round 3 inertia has
    // fallen from the one-cluster start (descent pinned exactly).
    val a = Seq.fill(64)(0.0)
    val b = Seq.fill(64)(1.0)
    val rows = (0 until 8).map(i => (i.toLong, a)) ++
      (8 until 16).map(i => (i.toLong, b))
    val out = KmeansAudit.audit(vecs(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val r1 = out.filter(_._1 == 1L)
    assert(r1.length == 1 && r1.head._2 == 0L && r1.head._3 == 16L,
      s"round 1 must put all 16 points in cluster 0: ${r1.toSeq}")
    // quantized A-dim = 4000, B-dim = 5000 -> dist(B, A) = 64e6 per B
    // point, 8 points
    assert(r1.head._4 == 8L * 64L * 1000000L,
      s"round-1 inertia must be the exact integer A-B mass: ${r1.head._4}")
    val inertiaByRound = out.groupBy(_._1).view
      .mapValues(_.map(_._4).sum).toSeq.sortBy(_._1)
    assert(inertiaByRound.last._2 <= inertiaByRound.head._2)
  }
}
