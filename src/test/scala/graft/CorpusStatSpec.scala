package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{DupCoverage, GoodTuring, Kappa, QuantileNorm}

/** Round-11 wave-2 corpus statistics (q233–q236): interval-union
  * coverage, the Good–Turing spectrum, Cohen's κ, and the quantile-
  * normalization map — all against hand-computed closed forms.
  */
class CorpusStatSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.functions._

  private def docs(rows: Seq[(Long, String, String)]) =
    spark.createDataFrame(
      rows.map { case (id, src, text) => Row(id, src, text) }.asJava,
      StructType.fromDDL("doc_id BIGINT, source STRING, text STRING"))

  private def w(n: Int, tag: String = "u") =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  // ---- q233 -------------------------------------------------------

  test("q233 interval union: overlapping dup spans never double-count") {
    // docs 1 and 2 share tokens 1..12 (12 tokens) then diverge; doc 1
    // has 20 tokens. Dup 8-gram starts in doc 1: positions 0..4
    // (grams fully inside the shared prefix) -> union = 4*1 + 8 = 12.
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val d = docs(Seq(
      (1L, "A", shared + " " + w(8, "x")),
      (2L, "B", shared + " " + w(8, "y"))))
    val out = DupCoverage.coverage(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out("A") == ((20L, 12L)), s"got ${out("A")}")
    assert(out("B") == ((20L, 12L)))
  }

  test("q233 identical docs are fully covered; unique docs are zero") {
    val d = docs(Seq(
      (1L, "A", w(10, "c")), (2L, "A", w(10, "c")), (3L, "A", w(9, "z"))))
    val Row(_, nDocs, tot, cov, bp, half) = DupCoverage.coverage(d).collect().head
    assert(nDocs == 3L && tot == 29L && cov == 20L)
    assert(bp == 20L * 10000L / 29L)
    assert(half == 2L, "both identical docs cross the half-dup bar")
  }

  test("q233 short docs (< 8 tokens) count in the denominator only") {
    val d = docs(Seq((1L, "A", w(5)), (2L, "A", w(5))))
    val Row(_, _, tot, cov, _, _) = DupCoverage.coverage(d).collect().head
    assert(tot == 10L && cov == 0L)
  }

  // ---- q234 -------------------------------------------------------

  test("q234 hand spectrum: p0 and the smoothed singleton count") {
    val d = docs(Seq((1L, "S", "a a a b b c")))
    val Row(_, nTok, nTyp, n1, n2, n3, n4, n5, p0, r1) =
      GoodTuring.spectrum(d).collect().head
    assert(nTok == 6L && nTyp == 3L)
    assert((n1, n2, n3, n4, n5) == ((1L, 1L, 1L, 0L, 0L)))
    assert(p0 == 1.0 / 6.0)
    assert(r1 == 2.0 * 1.0 / 1.0)
  }

  test("q234 all-singleton source reserves the full unseen mass n1/n") {
    val d = docs(Seq((1L, "S", "a b c d")))
    val row = GoodTuring.spectrum(d).collect().head
    assert(row.getDouble(8) == 1.0, "p_unseen must be 1 when every type is a singleton")
    assert(row.getDouble(9) == 0.0, "r1* = 2*n2/n1 = 0 with no doubletons")
  }

  // ---- q235 -------------------------------------------------------

  private def pairs(rows: Seq[(String, String)]) =
    spark.createDataFrame(
      rows.map { case (a, b) => Row(a, b) }.asJava,
      StructType.fromDDL("r1 STRING, r2 STRING"))

  test("q235 perfect agreement gives kappa 1; a known 2x2 matrix matches by hand") {
    val perfect = Kappa.kappaOf(
      pairs(Seq(("x", "x"), ("y", "y"), ("x", "x"))), col("r1"), col("r2"))
      .collect().head
    assert(perfect.getDouble(4) == 1.0)
    // classic fixture: n=100, diag=70, marginals r=(50,50), c=(60,40)
    // E = 50*60+50*40 = 5000; kappa = (100*70-5000)/(10000-5000) = 0.4
    val m = pairs(
      Seq.fill(35)(("a", "a")) ++ Seq.fill(15)(("a", "b")) ++
        Seq.fill(25)(("b", "a")) ++ Seq.fill(25)(("b", "b")))
    val row = Kappa.kappaOf(m, col("r1"), col("r2")).collect().head
    assert(row.getLong(0) == 100L && row.getLong(1) == 60L)
    // diag=60, E=5000 -> kappa = (6000-5000)/(10000-5000) = 0.2
    assert(row.getDouble(4) == 0.2, s"got ${row.getDouble(4)}")
  }

  test("q235 rectangular matrices (label never predicted) stay finite and penalized") {
    // declared zh never predicted: its column marginal is 0, so it
    // adds no chance mass but depresses observed agreement.
    val row = Kappa.kappaOf(
      pairs(Seq(("en", "en"), ("zh", "en"))), col("r1"), col("r2"))
      .collect().head
    // n=2 diag=1; rm=(en 1, zh 1), cm=(en 2, zh 0) -> E=2
    // kappa = (2*1-2)/(4-2) = 0
    assert(row.getDouble(4) == 0.0)
  }

  // ---- q236 -------------------------------------------------------

  private def sized(rows: Seq[(Long, String, Long)]) =
    spark.createDataFrame(
      rows.map { case (id, src, n) => Row(id, src, n) }.asJava,
      StructType.fromDDL("doc_id BIGINT, source STRING, n_chars BIGINT"))

  test("q236 single source maps to the identity") {
    val d = sized(Seq((1L, "A", 10L), (2L, "A", 30L), (3L, "A", 20L)))
    val Row(_, n, sumRaw, sumNorm, _, _, mn, mx) =
      QuantileNorm.normalize(d).collect().head
    assert(n == 3L && sumRaw == 60L && sumNorm == 60L)
    assert(mn == 10L && mx == 30L)
  }

  test("q236 shifted same-shape sources land on identical normalized sums") {
    // A = {10, 20}, B = {110, 120}: same shape, shifted scale. Pooled
    // sorted = (10, 20, 110, 120); both sources' ranks (1, 2) of m=2
    // map to pooled positions (2r-1)*4/(2*2)+1 = (2, 4) -> both get
    // norm values {20, 120}.
    val d = sized(Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "B", 110L), (4L, "B", 120L)))
    val out = QuantileNorm.normalize(d).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("A") == out("B"), s"got $out")
    assert(out("A") == 140L)
  }
}
