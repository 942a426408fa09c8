package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dsir, Drift, Regression}

/** Behavioral checks for the round-9 statistics tier (q129 DSIR
  * importance weights, q130 group-wise regression, q131 KL source
  * drift) — the oracle proves cross-engine agreement on the corpus;
  * these pin the mathematics on crafted inputs: an exact collinear
  * fit, content-keyed weight invariance, the smoothing floor, and
  * KL's sign/sensitivity.
  */
class StatsSpec extends SparkSpec {

  // ---- q130: group-wise regression ----

  test("q130 collinear fixture: exact slope/intercept, r² = 1") {
    import spark.implicits._
    // group a: y = 2x + 3 exactly; group b: same with one bent point
    val pts = Seq(
      ("a", 1.0, 5.0), ("a", 2.0, 7.0), ("a", 3.0, 9.0), ("a", 4.0, 11.0),
      ("b", 1.0, 5.0), ("b", 2.0, 7.0), ("b", 3.0, 9.0), ("b", 4.0, 20.0))
      .toDF("g", "x", "y")
    val out = Regression.fit(pts, "g", col("x"), col("y")).collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    val a = out("a")
    assert(a.getAs[Double]("slope") == 2.0)
    assert(a.getAs[Double]("intercept") == 3.0)
    assert(a.getAs[Double]("r2") == 1.0)
    val b = out("b")
    assert(b.getAs[Double]("r2") < 1.0 && b.getAs[Double]("slope") > 2.0)
  }

  // ---- q129: DSIR importance weights ----

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("q129 weights are content-keyed and separate target-typical from raw-typical") {
    // target slice speaks 'aa bb', the raw remainder speaks 'zz yy';
    // counts are large enough that the 256-bucket smoothing floor
    // cannot flip the sign of a clearly target-typical doc
    val tgtText = Seq.fill(100)("aa bb").mkString(" ")
    val rawText = Seq.fill(100)("zz yy").mkString(" ")
    val corpus = docs(Seq(
      (1L, "tgt", tgtText), (2L, "tgt", tgtText),
      (3L, "raw", rawText), (4L, "raw", rawText),
      // probe: target-typical content under a raw label
      (5L, "raw", tgtText)))
    val w = Dsir.importanceWeights(corpus, col("source") === "tgt").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // identical content ⇒ identical weight regardless of label
    assert(w(1L).getAs[Double]("w") == w(5L).getAs[Double]("w"),
      "weight must follow content, not the source label")
    // target-typical content keeps (w > 0) even under a raw label;
    // raw-typical content is rejected
    assert(w(5L).getAs[Boolean]("keep") && w(5L).getAs[Double]("w") > 0)
    assert(!w(3L).getAs[Boolean]("keep") && w(3L).getAs[Double]("w") < 0)
  }

  test("q129 smoothing keeps weights finite for tokens unseen in the target") {
    val corpus = docs(Seq(
      (1L, "tgt", "aa aa aa"),
      (2L, "raw", "qq qq qq")))   // 'qq' has zero target mass
    val w = Dsir.importanceWeights(corpus, col("source") === "tgt").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("w")).toMap
    assert(!w(2L).isNaN && !w(2L).isInfinite && w(2L) < 0)
  }

  // ---- q131: KL source drift ----

  test("q131 KL is non-negative on the corpus and the grid covers the vocabulary") {
    val out = run("q131_source_drift").collect()
    assert(out.nonEmpty)
    // Gibbs ≥ 0, to the 1e-6 per-cell term-quantization tolerance
    assert(out.forall(_.getAs[Double]("kl") >= -1e-5), "smoothed KL must be ≥ 0")
    val nVocab = out.head.getAs[Long]("n_vocab")
    assert(out.forall(_.getAs[Long]("n_vocab") == nVocab))
    assert(out.forall(r => r.getAs[Long]("n_vocab_used") <= nVocab))
  }

  test("q131 a drifted source stands out against look-alike sources") {
    val corpus = docs(Seq(
      (1L, "s1", "aa bb cc dd aa bb cc dd"),
      (2L, "s2", "aa bb cc dd aa bb cc dd"),
      (3L, "s3", "aa bb cc dd aa bb cc dd"),
      (4L, "weird", "zz zz zz zz zz zz zz zz")))  // disjoint vocabulary
    val kl = Drift.sourceDrift(corpus).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl")).toMap
    assert(kl("weird") > 3 * kl("s1"),
      s"disjoint-vocab source must dominate: ${kl.toSeq.sorted}")
    // absence counts: the drifted source uses 1 of 5 vocab tokens
    val weird = Drift.sourceDrift(corpus).collect()
      .find(_.getAs[String]("source") == "weird").get
    assert(weird.getAs[Long]("n_vocab_used") == 1L && weird.getAs[Long]("n_vocab") == 5L)
  }
}
