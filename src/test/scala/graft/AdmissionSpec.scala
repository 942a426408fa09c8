package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.queries.{Dsir, IngestGate}

/** q267 Gumbel-top-k DSIR selection and q268 delta-ingest admission:
  * planted-vocabulary selection pressure, exact-k/determinism, and
  * the verdict precedence ladder. (The oracle gate proves DuckDB
  * replays both plans; these pin the semantics.)
  */
class AdmissionSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docs(rows: Seq[(Long, String, String)]) =
    spark.createDataFrame(
      rows.map { case (id, text, src) =>
        Row(id, text, "en", src, text.length.toLong)
      }.asJava,
      StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"))

  test("q267 selects the target-vocabulary docs under planted separation") {
    // target docs speak vocabulary A, raw docs vocabulary B: every
    // A-doc's importance weight is strongly positive, every B-doc's
    // strongly negative, and 2·Gumbel noise (stddev ~2.6) cannot
    // bridge the gap — the top-10 must be exactly the 10 target docs
    val a = (1 to 25).map(i => s"alpha$i").mkString(" ")
    val b = (1 to 25).map(i => s"beta$i").mkString(" ")
    val rows = (1L to 10L).map(i => (i, a, "tgt")) ++
      (11L to 30L).map(i => (i, b, "raw"))
    val out = Dsir.gumbelTopK(docs(rows), col("source") === "tgt", 10).collect()
    assert(out.length === 10)
    assert(out.map(_.getLong(0)).toSet === (1L to 10L).toSet)
    assert(out.forall(_.getDouble(3) > 0)) // target-doc weights positive
  }

  test("q267 is deterministic and returns exactly k rows") {
    val t = tables.documents
    val once = Dsir.gumbelTopK(t, col("source").isin("src1", "src2", "src3"), 25)
      .collect().map(_.toSeq).toSeq
    val again = Dsir.gumbelTopK(t, col("source").isin("src1", "src2", "src3"), 25)
      .collect().map(_.toSeq).toSeq
    assert(once.length === 25)
    assert(once === again)
  }

  test("q268 verdict precedence: dup_base > dup_delta > quality > admitted") {
    val long = (1 to 30).map(i => s"w$i").mkString(" ") +
      " filler tokens to clear the hundred character floor easily"
    val rows = Seq(
      // base docs (ids not % 5)
      (1L, long, "s1"),
      (2L, "base only text here with enough words " + long, "s1"),
      // delta: exact canonical copy of base doc 1 -> dup_base (even
      // though re-cased and re-punctuated)
      (5L, long.toUpperCase + "!!", "s1"),
      // short delta twins: 10 (first) falls through to quality, 20 is
      // dup_delta — which OUTRANKS its own shortness
      (10L, "twin text thing", "s1"),
      (20L, "TWIN, text thing", "s1"),
      // delta clean doc -> admitted
      (25L, "a wholly novel delta document " + long + " extra tail", "s1"))
    val out = IngestGate.report(docs(rows)).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out === Map(
      "dup_base" -> 1L, "dup_delta" -> 1L, "quality" -> 1L, "admitted" -> 1L))
  }

  test("q268 dup_base outranks quality: a short base-dup is dup_base") {
    val rows = Seq(
      (1L, "short text", "s1"),          // base
      (5L, "SHORT; text", "s1"))         // delta: base dup AND short
    val out = IngestGate.report(docs(rows)).collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "dup_base")
  }
}
