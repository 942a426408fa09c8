package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.operators.TopK

/** q103: BM25 retrieval for a QUERY TABLE — the multi-tenant twin of
  * q97: when the query stream is unbounded (every user search, every
  * RAG lookup), the fixed-term zero-shuffle scan shape stops paying
  * and the standard answer is the inverted shape: post each doc's
  * QUERY-RELEVANT terms only, join queries to postings on the term,
  * aggregate per (query, doc), top-k per query. 32 queries of up to 3
  * terms each are derived from the corpus itself (tokens 1/4/7 of
  * docs 0–31 — closed-form on both engines).
  *
  * Scale shape (100 TB corpus × unbounded queries): the explode
  * stream is FILTERED against the distinct query-term set (a
  * broadcast-sized frame — AQE decides, never forced) BEFORE any
  * exchange, so the (doc, term, tf) postings shuffle carries only
  * query-relevant tokens, not the corpus vocabulary; df/N/T stats are
  * vocabulary- and one-row-sized; scoring joins ride the term key;
  * the only doc-volume exchange is the per-(query, doc) aggregate and
  * the per-query top-k window. Docs matching no query term never
  * leave their scan partition.
  *
  * Determinism (§6): the per-(query, doc) score is a SUM over a
  * data-ordered row set, so each term contribution is QUANTIZED to 6
  * decimals first (collapsing the ≤1-ulp cross-engine `ln`
  * difference) and summed as exact DECIMAL(20,10) — order-independent
  * — then cast double once. Ordering is (score desc, doc_id) per
  * query: total and tie-stable.
  */
object MultiQuery {

  val q103 = Q.of(
    "q103_bm25_queryset",
    """WITH base AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), q AS (
      |  SELECT doc_id AS qid, list_distinct([w[1], w[4], w[7]]) AS terms
      |  FROM base WHERE doc_id < 32
      |), qt AS (
      |  SELECT qid, unnest(terms) AS t FROM q
      |), stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(len(w)) AS BIGINT) AS tt FROM base
      |), tok AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS t FROM base
      |), tf AS (
      |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf,
      |         CAST(min(dl) AS BIGINT) AS dl
      |  FROM tok WHERE t IN (SELECT DISTINCT t FROM qt)
      |  GROUP BY doc_id, t
      |), dfreq AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t
      |), contrib AS (
      |  SELECT qt.qid, tf.doc_id,
      |    round(
      |      ln(CAST(1 AS DOUBLE) + (CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
      |      * ((CAST(tf AS DOUBLE) * 2.2)
      |         / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl * n AS DOUBLE) / CAST(tt AS DOUBLE))))),
      |      6) AS c
      |  FROM qt
      |  JOIN tf ON qt.t = tf.t
      |  JOIN dfreq ON dfreq.t = tf.t, stats
      |), scored AS (
      |  SELECT qid, doc_id,
      |    CAST(sum(CAST(c AS DECIMAL(20,10))) AS DOUBLE) AS score,
      |    CAST(count(*) AS BIGINT) AS n_terms
      |  FROM contrib GROUP BY qid, doc_id
      |)
      |SELECT qid, doc_id, score, n_terms FROM (
      |  SELECT qid, doc_id, score, n_terms,
      |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
      |  FROM scored
      |) WHERE rk <= 10
      |ORDER BY qid, doc_id""".stripMargin) { t =>
    search(t.documents, maxQid = 32, k = 10).orderBy("qid", "doc_id")
  }

  /** The pipeline, factored for spec fixtures (crafted corpora where
    * per-query rankings are hand-checkable and q97-consistency can be
    * asserted for a single-query table).
    */
  def search(docs: DataFrame, maxQid: Int, k: Int): DataFrame = {
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    val qt = base.filter(col("doc_id") < maxQid)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(array(
          element_at(col("w"), 1), element_at(col("w"), 4),
          element_at(col("w"), 7)))).as("t"))
    val stats = base.agg(
      count(lit(1)).cast("long").as("n"),
      sum(size(col("w"))).cast("long").as("tt"))
    val tok = base.select(col("doc_id"),
      size(col("w")).cast("long").as("dl"), explode(col("w")).as("t"))
    // posting only query-relevant terms: the equi-join against the
    // distinct term set prunes the stream before the first exchange
    val tf = tok
      .join(qt.select(col("t").as("qterm")).distinct(),
        col("t") === col("qterm"))
      .groupBy("doc_id", "t")
      .agg(count(lit(1)).cast("long").as("tf"), min("dl").as("dl"))
    val dfreq = tf.groupBy("t").agg(count(lit(1)).cast("long").as("df"))
    val contrib = qt
      .join(tf.withColumnRenamed("t", "t2"), col("t") === col("t2"))
      .join(dfreq.withColumnRenamed("t", "t3"), col("t2") === col("t3"))
      .crossJoin(broadcast(stats)) // one-row stats frame
      .select(col("qid"), col("doc_id"),
        round(
          log(lit(1.0) +
            ((col("n") - col("df")).cast("double") + lit(0.5)) /
              (col("df").cast("double") + lit(0.5))) *
            ((col("tf").cast("double") * lit(2.2)) /
              (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
                lit(0.75) * ((col("dl") * col("n")).cast("double") /
                  col("tt").cast("double"))))),
          6).as("c"))
    val scored = contrib.groupBy("qid", "doc_id")
      .agg(sum(col("c").cast("decimal(20,10)")).cast("double").as("score"),
        count(lit(1)).cast("long").as("n_terms"))
    TopK.perGroup(scored, Seq(col("qid")),
        Seq(col("score").desc, col("doc_id")), k)
      .select("qid", "doc_id", "score", "n_terms")
  }

  def all: Seq[Q] = Seq(q103)
}
