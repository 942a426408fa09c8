package graft

import org.apache.spark.sql.functions._

import graft.queries.{LmScore, Retrieval}

/** Behavioral + plan pins for the round-8 scoring pair: q95 (corpus-LM
  * quality) and q97 (BM25 retrieval). The oracles prove cross-engine
  * agreement on the synthetic corpus; these pin the semantics on
  * crafted corpora with hand-computable masses and the zero-shuffle
  * scoring-plan contracts.
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("q95 LM mass accounting is exact on a hand-computed corpus") {
    // counts: a=3 b=1 c=1 d=1, T=6; V=2 vocab = {a(3), b(1)} (count
    // desc, token asc — b beats c/d on the tie)
    val docs = Seq((1L, "a a b"), (2L, "a c d")).toDF("doc_id", "text")
    val out = LmScore.report(docs, v = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_tokens") == 3L)
    assert(d1.getAs[Long]("known_mass") == 7L)          // 3 + 3 + 1
    assert(d1.getAs[Double]("oov_ratio") == 0.0)
    assert(d1.getAs[Double]("mean_token_prob") == 7.0 / 18.0) // 7 / (3 · 6)
    assert(d1.getAs[String]("fluency") == "fluent")
    val d2 = out(2L)
    assert(d2.getAs[Long]("known_mass") == 3L)          // a only
    assert(d2.getAs[Double]("oov_ratio") == 2.0 / 3.0)  // c, d OOV
    assert(d2.getAs[String]("fluency") == "noisy")
    CacheScope.releaseAll()
  }

  test("q95 separates boilerplate from OOV-heavy noise on the registry corpus shape") {
    // boilerplate: high-frequency tokens only; noise: mostly singletons
    // beyond a small vocab
    val boiler = (1 to 8).map(i => (i.toLong, "the quick fox jumps"))
    val noise = Seq((100L, (1 to 20).map(j => s"zzx$j").mkString(" ")))
    val docs = (boiler ++ noise).toDF("doc_id", "text")
    val rows = LmScore.report(docs, v = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Double]("mean_token_prob") >
      rows(100L).getAs[Double]("mean_token_prob"))
    assert(rows(1L).getAs[String]("fluency") == "fluent")
    assert(rows(100L).getAs[String]("fluency") == "noisy")
    CacheScope.releaseAll()
  }

  test("q97 BM25: tf raises, absent terms contribute nothing, length normalizes down") {
    val docs = Seq(
      (1L, "vector vector vector pad pad pad pad pad"),
      (2L, "vector pad pad pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad pad pad"),
      // same single-occurrence tf as doc 2, 4x the length
      (4L, ("vector " + Seq.fill(31)("pad").mkString(" ")))
    ).toDF("doc_id", "text")
    val out = Retrieval.search(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("matched_terms"), r.getAs[Double]("score_r"))).toMap
    assert(out(3L)._1 == 0L && out(3L)._2 == 0.0,
      "doc with no query terms must score exactly zero")
    assert(out(1L)._2 > out(2L)._2, "higher tf must raise the score")
    assert(out(2L)._2 > out(4L)._2,
      "same tf in a longer doc must score lower (b-normalization)")
  }

  test("q103 query-table BM25: per-query ranking and term accounting on a crafted corpus") {
    import graft.queries.MultiQuery
    // doc 0 is the only query (maxQid 1): tokens 1/4/7 = alpha/beta/gamma
    val docs = Seq(
      (0L, "alpha x x beta y y gamma z"),
      (10L, "alpha beta gamma pad pad pad pad pad"), // 3 terms
      (11L, "alpha beta pad pad pad pad pad pad"),   // 2 terms
      (12L, "alpha pad pad pad pad pad pad pad"),    // 1 term
      (13L, "pad pad pad pad pad pad pad pad")       // no terms
    ).toDF("doc_id", "text")
    val out = MultiQuery.search(docs, maxQid = 1, k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms"), r.getAs[Double]("score"))).toMap
    assert(!out.contains(13L), "doc matching no query term must not post")
    assert(out(10L)._1 == 3L && out(11L)._1 == 2L && out(12L)._1 == 1L)
    assert(out(10L)._2 > out(11L)._2 && out(11L)._2 > out(12L)._2,
      "equal-length docs must rank by matched-term count")
    assert(out(0L)._2 == out(10L)._2,
      "identical tf/dl profiles must quantize to identical scores")
  }

  test("q95/q97 scoring plans never hash-shuffle the corpus") {
    // q97: the only exchanges are the one-row stats reduction — every
    // shuffle in the plan is a single-partition gather, never a
    // hash repartition of document rows
    val bm25 = Registry.byName("q97_bm25").run(spark, sfDir)
    val wide97 = shuffles(bm25).filterNot(
      _.outputPartitioning.numPartitions == 1)
    assert(wide97.isEmpty,
      s"q97 hash-shuffled the corpus:\n${planOf(bm25)}")

    // q95: the scoring side joins the vocab via broadcast — the doc →
    // token explode must reach the per-doc aggregate through exactly
    // one hash exchange (doc_id), with the model branches behind the
    // cache; no token-level corpus shuffle on the scoring path
    spark.catalog.clearCache()
    val lm = Registry.byName("q95_lm_quality").run(spark, sfDir)
    lm.count() // finalize AQE
    val wide95 = shuffles(lm).filterNot(
      _.outputPartitioning.numPartitions == 1)
    assert(wide95.size <= 2, // doc_id agg + presentation sort range
      s"q95 scoring path shuffled more than (doc_id agg, sort):\n${planOf(lm)}")
    CacheScope.releaseAll()
    spark.catalog.clearCache()
  }
}
