package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{Assortativity, Heaps, LogOdds, NearestEvent, Rrf}

/** Round-11 second-wave queries (q228–q232): hand-computed closed
  * forms for log-odds, assortativity, RRF, nearest join, and Heaps.
  */
class MixingSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.functions._

  private def docs(rows: Seq[(Long, String, String)]) =
    spark.createDataFrame(
      rows.map { case (id, src, text) => Row(id, src, text) }.asJava,
      StructType.fromDDL("doc_id BIGINT, source STRING, text STRING"))

  // ---- q228 -------------------------------------------------------

  test("q228 over-used term tops its source; evidence floor excludes rare terms") {
    // A over-uses foo, B over-uses bar, base is balanced; rare has
    // only 4 occurrences in A — below the MinCount = 5 floor.
    val d = docs(Seq(
      (1L, "A", "foo foo foo foo foo base base base base base rare rare rare rare"),
      (2L, "B", "bar bar bar bar bar base base base base base")))
    val out = LogOdds.topTerms(d).collect()
      .map(r => (r.getString(0), r.getString(2)) -> ((r.getLong(1), r.getDouble(6))))
      .toMap
    assert(out.contains(("A", "foo")) && out(("A", "foo"))._1 == 1L)
    assert(out(("A", "foo"))._2 > 0.0, "over-used term must have positive z")
    assert(!out.keySet.exists(_ == ("A", "rare")), "4-count term must be floored out")
    assert(!out.keySet.exists(_ == ("A", "bar")), "term absent from A cannot rank for A")
    // the balanced term scores strictly below the over-used one
    assert(out(("A", "base"))._2 < out(("A", "foo"))._2)
  }

  // ---- q229 -------------------------------------------------------

  private def edges(rows: Seq[(Long, Long)]) =
    spark.createDataFrame(
      rows.map { case (a, b) => Row(a, b) }.asJava,
      StructType.fromDDL("pa BIGINT, pb BIGINT"))

  test("q229 star graph is perfectly disassortative (r = -1) with the exact knn curve") {
    val star = edges(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    val out = Assortativity.curve(star).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out(4L) == ((4L, 1.0, -1.0)))
    assert(out(1L) == ((4L, 4.0, -1.0)))
  }

  test("q229 matches the Newman closed form on a path graph") {
    // path 1-2-3-4: degrees 1,2,2,1. Directed ends: (1,2),(2,1),(2,2),
    // (2,2),(2,1),(1,2) -> m=6 sx=10 sxx=18 sxy=16
    // r = (6*16-100)/(6*18-100) = -4/8 = -0.5
    val path = edges(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val r = Assortativity.curve(path).collect().head.getDouble(3)
    assert(r == -0.5, s"got $r")
  }

  // ---- q230 -------------------------------------------------------

  test("q230 fusion arithmetic: both-lists membership dominates at equal ranks") {
    val la = spark.createDataFrame(
      Seq((1L, 1L), (2L, 2L)).map { case (d, r) => Row(d, r) }.asJava,
      StructType.fromDDL("doc_id BIGINT, ra BIGINT"))
    val lb = spark.createDataFrame(
      Seq((2L, 1L), (3L, 2L)).map { case (d, r) => Row(d, r) }.asJava,
      StructType.fromDDL("doc_id_b BIGINT, rb BIGINT"))
    val out = Rrf.fuse(la, lb).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0 / 61.0)
    assert(out(3L) == 1.0 / 62.0)
    assert(out(2L) == 1.0 / 62.0 + 1.0 / 61.0)
    assert(out(2L) > out(1L), "rank-2-in-both must beat rank-1-in-one")
  }

  test("q230 registry output is a deterministic 50-row ranking") {
    val rows = run("q230_rank_fusion").collect()
    assert(rows.length == 50)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 50L))
    val rrfs = rows.map(_.getDouble(4))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
  }

  // ---- q231 -------------------------------------------------------

  private def events(rows: Seq[(Long, Long, Long, String)]) =
    spark.createDataFrame(
      rows.map { case (id, u, us, ty) => Row(id, u, us, ty) }.asJava,
      StructType.fromDDL(
        "event_id BIGINT, user_id BIGINT, us BIGINT, event_type STRING"))
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")

  test("q231 picks the closer side, breaks exact ties to before, emits none") {
    val ev = events(Seq(
      (1L, 1L, 100L, "click"), (2L, 1L, 150L, "purchase"), (3L, 1L, 180L, "click"),
      (4L, 2L, 100L, "click"), (5L, 2L, 200L, "purchase"), (6L, 2L, 300L, "click"),
      (7L, 3L, 50L, "purchase"),
      (8L, 4L, 400L, "view")))
    val out = NearestEvent.nearest(ev).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(5)).map(_.asInstanceOf[Long]), r.getString(6))))
      .toMap
    assert(out(2L) == ((Some(30L), "after")))
    assert(out(5L) == ((Some(100L), "before")), "equal distance must resolve to before")
    assert(out(7L)._1.isEmpty && out(7L)._2 == null)
    assert(!out.contains(8L), "non-purchase rows must not be emitted")
  }

  test("q231 same-timestamp click counts as distance zero on the before side") {
    val ev = events(Seq(
      (1L, 9L, 500L, "click"), (2L, 9L, 500L, "purchase")))
    val Row(_, _, _, _, _, nearest, side) = NearestEvent.nearest(ev).collect().head
    assert(nearest == 0L && side == "before")
  }

  // ---- q232 -------------------------------------------------------

  test("q232 closed forms: one-new-term-per-doc gives beta 1, a template gives beta 0") {
    val d = docs(
      (1 to 8).map(i => (i.toLong, "lin", s"t$i")) ++
        (1 to 8).map(i => (100L + i, "tmpl", "w w w")))
    val out = Heaps.fit(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // lin: N_d = d, V_d = d -> y = x exactly -> beta 1, intercept 0
    assert(out("lin") == ((8L, 8L, 1.0, 0.0)))
    // tmpl: V_d = 1 always -> y = 0 -> beta 0, intercept 0
    assert(out("tmpl") == ((24L, 1L, 0.0, 0.0)))
  }
}
