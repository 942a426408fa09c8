package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.BloomCal

/** q258 Bloom calibration: the no-false-negative guarantee on a
  * planted contaminated doc, the flagged = true + fp accounting
  * identity, and the real-corpus FP budget at the deliberate
  * 8-bits/element sizing. (The oracle gate proves every probe is
  * DuckDB-replayable; these pin the semantics.)
  */
class BloomCalSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docs(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      rows.map { case (id, text) => Row(id, text) }.asJava,
      StructType.fromDDL("doc_id BIGINT, text STRING"))

  test("q258 planted contamination is fully flagged as true hits") {
    // doc 0 is the benchmark (doc_id % 7 = 0); doc 1 copies it
    // verbatim -> every one of its 3-gram shingles MUST flag (Bloom
    // has no false negatives) and count as a true member; doc 2 is
    // disjoint vocabulary
    val bench = (1 to 20).map(i => s"b$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val out = BloomCal.bloomCal(
      docs(Seq((0L, bench), (1L, bench), (2L, other))), 7)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.contains(1L), s"copied doc must be flagged: $out")
    val (flagged, trueHits, fp) = out(1L)
    assert(flagged == 18L && trueHits == 18L,
      s"all 18 copied shingles are members and must flag: $out")
    assert(fp == 0L, s"member shingles are not FPs: $out")
  }

  test("q258 real corpus: accounting identity, no false negatives, FP budget") {
    val rows = run("q258_bloom_cal").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, f, t, fp) =>
      assert(f == t + fp, s"doc $id: n_flagged != n_true + n_fp")
    }
    // at ~8 bits/element with k=5 the per-probe FP rate is ~2%; a
    // 25% global ceiling catches a broken filter (everything flags)
    // while staying robust to corpus drift
    val flagged = rows.map(_._2).sum.toDouble
    val fps = rows.map(_._4).sum.toDouble
    assert(fps / flagged < 0.25,
      s"FP share ${fps / flagged} blew the calibration budget")
    // no false negatives, cross-checked INDEPENDENTLY: an exact
    // q85-style string join on the same 3-gram shingle grain gives
    // each corpus doc's true member-shingle count, which must equal
    // q258's n_true exactly (membership is exact under the flag; the
    // filter only ever ADDS the fp tail)
    import org.apache.spark.sql.functions._
    val sh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(w) - 3)," +
          " i -> concat_ws(' ', slice(w, i + 1, 3))))")).as("sh"))
    val exact = sh.filter(col("doc_id") % 7 =!= 0)
      .join(sh.filter(col("doc_id") % 7 === 0).select("sh").distinct(), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trueByDoc = rows.map(r => r._1 -> r._3).toMap
    exact.foreach { case (id, n) =>
      assert(trueByDoc.getOrElse(id, 0L) == n,
        s"doc $id: exact member shingles $n != q258 n_true ${trueByDoc.get(id)}")
    }
  }
}
