package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{CurationV2, KFold, KneserNey}

/** q248 Kneser–Ney, q249 stratified k-fold, q250 curation v2: smoothing
  * closed forms, balance invariants, and gate-attribution fixtures.
  */
class CurationV2Spec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.functions._

  private def docs2(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      rows.map { case (id, text) => Row(id, text) }.asJava,
      StructType.fromDDL("doc_id BIGINT, text STRING"))

  test("q248 hand model: discount mass, continuation asymmetry, unseen-context backoff") {
    // train: "a b", "a b", "a c" -> c2: (a,b)=2 (a,c)=1; c1: a=3 n1p(a)=2
    // cont: b completes 1 context, c completes 1; T = 2 bigram types
    val train = docs2(Seq((1L, "a b"), (2L, "a b"), (3L, "a c")))
    // held: "a b" (seen), "a z" (unseen w2), "q b" (unseen context)
    val held = docs2(Seq((10L, "a b"), (11L, "a z"), (12L, "q b")))
    val out = KneserNey.score(train, held).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // lambda(a) = d * N1+(a,.) / c1(a) = 0.75 * 2 / 3
    val lambdaA = 0.75 * 2.0 / 3.0
    val pAB = (2.0 - 0.75) / 3.0 + lambdaA * (1.0 / 2.0)
    val pAZ = 0.0 / 3.0 + lambdaA * 0.0 // z never continues anything
    val pQB = 1.0 / 2.0 // pure continuation backoff
    // per-pair p is D20_6-quantized before the doc mean (q183 rule)
    assert(out(10L)._1 == 1L && math.abs(out(10L)._2 - pAB) < 1e-6,
      s"got ${out(10L)} want $pAB")
    assert(out(11L)._2 == pAZ)
    assert(out(12L)._1 == 0L && out(12L)._2 == pQB)
  }

  test("q248 probabilities over a context sum to ~1 (mass conservation)") {
    val train = docs2(Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b a")))
    // score every (a, w) for w in the continuation-bearing vocab + the
    // discount: sum_w p(w|a) must be 1 over the FULL vocab; checking
    // the seen continuations {a, b, c} covers all nonzero cont mass.
    val held = docs2(Seq((10L, "a a"), (11L, "a b"), (12L, "a c")))
    val ps = KneserNey.score(train, held).collect().map(_.getDouble(3)).sum
    assert(math.abs(ps - 1.0) < 2e-6, s"sum p(w|a) over vocab = $ps, want 1")
  }

  private def langDocs(rows: Seq[(Long, String, String)]) =
    spark.createDataFrame(
      rows.map { case (id, lang, text) => Row(id, lang, text) }.asJava,
      StructType.fromDDL("doc_id BIGINT, lang STRING, text STRING"))

  test("q249 fold sizes differ by at most one for every stratum-size residue") {
    val d = langDocs((1 to 5).flatMap { k =>
      val m = 5 * 3 + k // sizes 16..20 cover residues 1..0
      (1 to m).map(i => ((k * 1000 + i).toLong, s"L$k", s"text ${k}_$i"))
    })
    val out = KFold.assign(d).collect()
    out.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      assert(rows.length == 5, s"$lang must appear in all 5 folds")
      val sizes = rows.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$lang sizes $sizes")
      assert(rows.forall(_.getLong(4) == sizes.max - sizes.min))
    }
  }

  private def fullDocs(rows: Seq[(Long, String, String, String)]) =
    spark.createDataFrame(
      rows.map { case (id, src, lang, text) => Row(id, src, lang, text) }.asJava,
      StructType.fromDDL("doc_id BIGINT, source STRING, lang STRING, text STRING"))

  test("q250 attributes each doc to its FIRST failing gate and the waterfall sums to n") {
    def prose(tag: String) = (1 to 30).map(i => s"${tag}word$i").mkString(" ")
    val shared = (1 to 30).map(i => s"dup$i").mkString(" ")
    val d = fullDocs(Seq(
      // zh doc that is ALSO an exact dup: must count at 'lang', not 'exactdup'
      (1L, "S", "zh", prose("a")),
      (2L, "S", "zh", prose("a")),
      // junk entropy (repeated char) in an allowed lang
      (3L, "S", "en", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      // near-full cross-doc duplication
      (4L, "S", "en", shared), (5L, "S", "en", shared + " extra1 extra2"),
      // clean keeper
      (6L, "S", "en", prose("z"))))
    val r = CurationV2.curate(d).collect().head
    val (n, langF, entF, dupF, exF, kept) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6))
    assert(n == 6L)
    assert(langF == 2L, s"both zh docs at the lang gate, got $r")
    assert(entF == 1L, s"repeated-char doc at the entropy gate, got $r")
    assert(exF == 0L, "the exact dup was already counted at lang")
    assert(langF + entF + dupF + exF + kept == n, s"waterfall must sum to n: $r")
    assert(kept >= 1L)
  }
}
