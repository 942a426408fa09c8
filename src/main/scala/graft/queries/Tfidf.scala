package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{CacheScope, Q}
import graft.functions.det

/** q193: TF-IDF sparse-cosine document similarity — the WEIGHTED
  * third leg of the near-dup stack: q41/q43 compare docs as token
  * SETS (Jaccard), q44/q115 as dense embeddings; this one compares
  * them as classic sparse TF-IDF vectors (Salton's vector-space
  * model, public), where rare shared bigrams count for more than
  * ubiquitous ones. Top-3 most-similar partners per document.
  *
  * Scale design — the three standard sparse-similarity bounds, all
  * mirrored in the oracle so the semantics stay exact:
  *  1. BLOCKING: pairs only form within a (lang, source) block
  *     (cross-lang "similarity" over bigram vocab is noise; q152's
  *     blocked-linkage discipline). The postings join key is
  *     (lang, source, term) — a block never sees another block's
  *     postings.
  *  2. DF PRUNING: bigrams with corpus df·4 > N are stop-bigrams and
  *     are dropped from postings entirely (integer predicate — no
  *     fraction determinism risk). This is what caps the classic
  *     Σ df² postings-join blowup: the highest-df terms are exactly
  *     the quadratic ones, and exactly the least informative.
  *  3. TOP-K OUTPUT: per-doc top-3 partners via one window (cosine
  *     desc, partner asc — total order), never the full pair list.
  *
  * Determinism: idf = log2(N/df) — log2 is the engine-matched
  * transcendental (q175's discount proved it bit-identical across
  * Spark and DuckDB; ln is NOT in that proven set); per-term dot
  * contributions w₁·w₂ and per-doc norm terms w² are D20_6-quantized
  * then summed exactly (order-independent); cosine is a fixed IEEE
  * sequence over the exact sums, token-identical both engines.
  *
  * One documents scan feeds the cached per-doc term frame; df and
  * postings both fold from it (CacheScope lifecycle).
  */
object Tfidf {

  private val K = 3

  /** Per-doc top-K TF-IDF cosine partners within (lang, source)
    * blocks. `terms` = (doc_id, lang, source, term, tf); `nDocs` is
    * the corpus size (bounded driver-side scalar — the IVF-centroid
    * rule). Factored so the spec can pin hand-computed cosines, the
    * df-cap cutoff, and identical-doc cosine = 1.
    */
  def topkCosine(terms: DataFrame, nDocs: Long, k: Int = K): DataFrame = {
    // df-cap applied BEFORE the join, and no forced broadcast: on a
    // 100 TB corpus the bigram vocabulary is itself billions of rows,
    // so a broadcast(df) hint would OOM the driver long before AQE
    // could demote it. Pruning first means (a) the join input carries
    // only informative terms — the inner join then IS the prune — and
    // (b) AQE is free to pick broadcast-hash when the pruned vocab is
    // genuinely small (it is at bench SF) and sort-merge when it
    // isn't. Plan pinned in PlanHygieneSpec (no broadcast hint nodes).
    val df = terms
      .groupBy(col("term")).agg(count(lit(1)).as("graft_df"))
      .filter(col("graft_df") * 4 <= lit(nDocs))
    val postings = terms
      .join(df, Seq("term"))
      .withColumn("graft_w",
        col("tf").cast("double") *
          log2(lit(nDocs).cast("double") / col("graft_df").cast("double")))
    val norms = postings
      .groupBy(col("doc_id"))
      .agg(sum((col("graft_w") * col("graft_w")).cast(det.D20_6)).as("graft_nsq"))
    val a = postings.select(
      col("lang"), col("source"), col("term"),
      col("doc_id").as("doc_a"), col("graft_w").as("graft_wa"))
    val b = postings.select(
      col("lang"), col("source"), col("term"),
      col("doc_id").as("doc_b"), col("graft_w").as("graft_wb"))
    val dots = a
      .join(b, Seq("lang", "source", "term"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum((col("graft_wa") * col("graft_wb")).cast(det.D20_6)).as("graft_dot"))
    val byCos = Window.partitionBy(col("doc_a"))
      .orderBy(col("cosine").desc, col("doc_b"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("graft_nsq").as("graft_na")),
        Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("graft_nsq").as("graft_nb")),
        Seq("doc_b"))
      .withColumn("cosine",
        col("graft_dot").cast("double") /
          (sqrt(col("graft_na").cast("double")) * sqrt(col("graft_nb").cast("double"))))
      .withColumn("rk", row_number().over(byCos))
      .filter(col("rk") <= k)
      .select(col("doc_a").as("doc_id"), col("doc_b").as("partner"),
        col("cosine"), col("rk"))
  }

  val q193 = Q.of(
    "q193_tfidf_cosine",
    s"""WITH toks AS (
      |  SELECT doc_id, lang, source, string_split(text, ' ') AS ts
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id, lang, source, ts[g.i] || ' ' || ts[g.i + 1] AS term
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(ts))) AS i) g
      |), terms AS (
      |  SELECT doc_id, lang, source, term, COUNT(*) AS tf
      |  FROM bg GROUP BY 1, 2, 3, 4
      |), df AS (
      |  SELECT term, COUNT(*) AS df FROM terms GROUP BY 1
      |), n AS (
      |  SELECT COUNT(*) AS n FROM documents
      |), post AS (
      |  SELECT t.doc_id, t.lang, t.source, t.term,
      |    CAST(t.tf AS DOUBLE)
      |      * log2(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS w
      |  FROM terms t JOIN df USING (term) CROSS JOIN n
      |  WHERE df.df * 4 <= n.n
      |), norms AS (
      |  SELECT doc_id, SUM(CAST(w * w AS DECIMAL(20,6))) AS nsq
      |  FROM post GROUP BY 1
      |), dots AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    SUM(CAST(a.w * b.w AS DECIMAL(20,6))) AS dot
      |  FROM post a
      |  JOIN post b ON a.lang = b.lang AND a.source = b.source
      |    AND a.term = b.term AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2
      |), cos AS (
      |  SELECT doc_a, doc_b,
      |    CAST(dot AS DOUBLE)
      |      / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
      |      AS cosine
      |  FROM dots
      |  JOIN norms na ON na.doc_id = doc_a
      |  JOIN norms nb ON nb.doc_id = doc_b
      |), ranked AS (
      |  SELECT doc_a AS doc_id, doc_b AS partner, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY doc_a ORDER BY cosine DESC, doc_b) AS rk
      |  FROM cos
      |)
      |SELECT doc_id, partner, cosine, rk FROM ranked
      |WHERE rk <= $K
      |ORDER BY doc_id, rk""".stripMargin) { t =>
    {
      val toks = split(col("text"), " ")
      // trackedCache (not withCacheScope): the cache must outlive this
      // builder — Bench/Verify clearCache between queries; library
      // users wrap calls in CacheScope.withCacheScope themselves.
      val terms = CacheScope.trackedCache(
        t.documents
          .select(col("doc_id"), col("lang"), col("source"),
            toks.as("graft_toks"))
          // single-token / empty docs: sequence(0, -1) is a DESCENDING
          // range under Spark semantics and element_at(toks, 0) throws
          // under ANSI — the BigramLm/Classifier size-guard discipline
          // applies here too (the oracle's range(1, len(ts)) is simply
          // empty for such docs, so the guard is semantics-neutral).
          .filter(size(col("graft_toks")) >= 2)
          .select(col("doc_id"), col("lang"), col("source"),
            explode(expr(
              """transform(sequence(0, size(graft_toks) - 2),
                |  i -> concat(element_at(graft_toks, i + 1), ' ',
                |              element_at(graft_toks, i + 2)))""".stripMargin))
              .as("term"))
          .groupBy(col("doc_id"), col("lang"), col("source"), col("term"))
          .agg(count(lit(1)).as("tf")))
      val nDocs = t.documents.count()
      topkCosine(terms, nDocs).orderBy(col("doc_id"), col("rk"))
    }
  }

  def all: Seq[Q] = Seq(q193)
}
