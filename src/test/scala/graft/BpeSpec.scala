package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** q119 BPE tokenizer: training fixtures (hand-computed merge
  * sequences), a differential encode check against an INDEPENDENT
  * sequential-merge reference (the expression uses min-rank-first;
  * the two algorithms agree by BPE's confluence property), and the
  * open-vocabulary / monotonicity invariants.
  */
class BpeSpec extends SparkSpec {

  /** Independent reference encoder: apply merges in TRAINING ORDER,
    * each exhaustively, one word at a time — structurally different
    * from BpeTokenize's find-lowest-rank-present loop.
    */
  private def refTokens(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = word.map(String.valueOf(_)).toVector
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
          out += (a + b); j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.result()
    }
    syms
  }

  private def refCount(text: String, merges: Seq[(String, String)]): Long =
    text.split(" ").filter(_.nonEmpty).map(w => refTokens(w, merges).length.toLong).sum

  private def sparkCount(text: String, merges: Seq[(String, String)]): Long = {
    import spark.implicits._
    Seq(text).toDF("t").select(Bpe.tokenCount(col("t"), merges).as("n"))
      .collect()(0).getAs[Long]("n")
  }

  test("train learns the hand-computed merge sequence") {
    // dict: "ab"×3, "abc"×2 → pairs (a,b)=5, (b,c)=2 → merge (a,b);
    // then (ab,c)=2 → merge (ab,c); then no pair ≥2 → stop early
    val merges = Bpe.train(Seq("ab" -> 3L, "abc" -> 2L), nMerges = 10)
    assert(merges == Seq(("a", "b"), ("ab", "c")))
  }

  test("train tie-breaks deterministically and ignores hapax pairs") {
    // (x,y)=2 and (p,q)=2 tie → lexicographically smallest pair first;
    // the hapax word "zz" contributes a once-seen pair that must never
    // become a merge
    val merges = Bpe.train(Seq("xy" -> 2L, "pq" -> 2L, "zz" -> 1L), nMerges = 10)
    assert(merges.take(2) == Seq(("p", "q"), ("x", "y")))
    assert(!merges.contains(("z", "z")))
  }

  test("encode: min-rank-first loop equals the sequential reference") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("d", "e"), ("de", "f"))
    for (t <- Seq("abcab", "abc abc de def", "", "xyz", "a", "aabbcc abcdef",
        "fedcba", "abcdefabcdef")) {
      assert(sparkCount(t, merges) == refCount(t, merges), s"text '$t'")
    }
  }

  test("encode differential on fixed-seed random text vs corpus-trained merges") {
    import spark.implicits._
    val docs = tables.documents.limit(40).select(col("doc_id"), col("text"))
    val merges = Bpe.learnFromCorpus(docs, "text", topV = 1000, nMerges = 50)
    assert(merges.nonEmpty)
    val got = docs.select(col("doc_id"), Bpe.tokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> refCount(r.getString(1), merges)).toMap
    assert(got == want)
    // fixed-seed random strings over a small alphabet (worst case for
    // merge-order ambiguity: dense repeated pairs)
    val rnd = new scala.util.Random(42)
    val texts = Seq.fill(60)(Seq.fill(rnd.nextInt(12) + 1)(
      Seq.fill(rnd.nextInt(8) + 1)("abcd".charAt(rnd.nextInt(4))).mkString).mkString(" "))
    val df = texts.toDF("t").select(Bpe.tokenCount(col("t"), merges).as("n"))
      .collect().map(_.getLong(0))
    texts.zip(df).foreach { case (t, n) =>
      assert(n == refCount(t, merges), s"text '$t'")
    }
  }

  test("invariants: open vocabulary, monotone in merges, empty = 0") {
    val merges = Bpe.train(Seq("aaaa" -> 5L), nMerges = 5)
    // unseen characters degrade to 1 token per char, never fail
    assert(sparkCount("qqq", merges) == 3L)
    assert(sparkCount("", merges) == 0L)
    // more merges can only shrink (or hold) the token count
    val m1 = merges.take(1)
    for (t <- Seq("aaaa", "aaa aa", "aabaa"))
      assert(sparkCount(t, merges) <= sparkCount(t, m1), s"text '$t'")
  }

  test("trained tables carry no rank inversions: every multi-char component was built earlier") {
    // The q119/q213 DuckDB oracle replays encoding as a rank-ordered
    // sequential fold; its equivalence with the native min-rank-first
    // loop rests on this structural property of TRAINED tables: a
    // merge can only reference symbols that already exist, so (x, yz)
    // can never rank before (y, z). Pin it directly on the
    // corpus-trained table instead of leaving it an argument.
    val merges = Bpe.learnFromCorpus(tables.documents, "text", topV = 5000, nMerges = 200)
    assert(merges.nonEmpty)
    val producedAt = merges.zipWithIndex
      .map { case ((a, b), i) => (a + b) -> i }.toMap
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      Seq(a, b).filter(_.length > 1).foreach { c =>
        val made = producedAt.get(c)
        assert(made.exists(_ < r),
          s"merge $r ($a, $b): component '$c' not produced by an earlier merge " +
            s"(produced at $made) — rank inversion, the oracle replay would diverge")
      }
    }
  }

  test("q119 runs end-to-end with a shuffle-free encode projection") {
    val df = run("q119_bpe_tokenize")
    val rows = df.collect()
    assert(rows.length == tables.documents.count())
    assert(rows.forall(_.getAs[Long]("n_tokens") > 0L))
    // subword property: token count is bounded by character count and
    // below the per-char ceiling on real text (merges actually fire)
    val sums = run("q119_bpe_tokenize")
      .agg(sum(col("n_tokens")).as("nt"), sum(col("n_chars")).as("nc"))
      .collect()(0)
    assert(sums.getAs[Long]("nt") < sums.getAs[Long]("nc"))
    // the ENCODE side is a pure projection: the only exchanges belong
    // to the presentation sort (range) — no hash exchange in the final
    // doc-grain plan
    assert(!planOf(df).contains("Exchange hashpartitioning"),
      s"encode should not shuffle:\n${planOf(df)}")
  }
}
