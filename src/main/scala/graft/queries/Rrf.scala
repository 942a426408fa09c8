package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q230: RECIPROCAL-RANK FUSION of two retrieval rankings (Cormack–
  * Clarke–Büttcher 2009, public; the standard hybrid-search combiner
  * in RAG stacks) — the rank-COMBINATION member of the retrieval tier
  * (q97/q103 score one lexical ranker, q175/q189 evaluate a ranking;
  * this merges rankers without score calibration: rrf(d) =
  * Σ_r 1/(60 + rank_r(d)) over each ranker's TOP-K list, missing
  * entries contribute 0 — truncated-list fusion is the production
  * form, score-free so a BM25 scale and a cosine scale need no
  * normalization).
  *
  * The two rankers over the q97 fixed query terms: A = total query-
  * term frequency (deep topical match), B = distinct-terms-matched
  * then shortest-doc (coverage-precision). Both are INTEGER-keyed
  * total orders with doc_id tiebreaks, so each top-K cut is
  * deterministic; the fused score is a fixed two-term IEEE sum of
  * 1/(60+rank) values — bit-identical cross-engine, and the final
  * top-k orders by (rrf DESC, doc_id).
  *
  * Scale shape (the q97 doctrine extended): per-doc features are
  * array folds over one split (no explode, no corpus shuffle); each
  * ranker is a TakeOrdered top-K (limit-pushed, never a global
  * window over the corpus — ranks are assigned AFTER the K-row cut,
  * where the window is a single tiny partition by construction); the
  * fusion is a K-row full outer join.
  */
object Rrf {

  private val K = 200
  private val RrfK = 60
  private val TopOut = 50
  private def terms = Retrieval.terms

  val q230 = Q.of(
    "q230_rank_fusion", {
      val tfCols = terms.map(t =>
        s"len(list_filter(string_split(text, ' '), x -> x = '$t')) AS tf_$t")
        .mkString(",\n      |    ")
      val tfSum = terms.map(t => s"tf_$t").mkString(" + ")
      val matched = terms.map(t => s"CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH base AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
      |    $tfCols
      |  FROM documents
      |), feats AS (
      |  SELECT doc_id, dl, CAST($tfSum AS BIGINT) AS tf,
      |    CAST($matched AS BIGINT) AS nm
      |  FROM base
      |), la AS (
      |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id) AS ra
      |  FROM (SELECT * FROM feats WHERE tf > 0
      |        ORDER BY tf DESC, doc_id LIMIT $K)
      |), lb AS (
      |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY nm DESC, dl, doc_id) AS rb
      |  FROM (SELECT * FROM feats WHERE nm > 0
      |        ORDER BY nm DESC, dl, doc_id LIMIT $K)
      |), fused AS (
      |  SELECT COALESCE(la.doc_id, lb.doc_id) AS doc_id, la.ra, lb.rb,
      |    COALESCE(1.0 / CAST($RrfK + la.ra AS DOUBLE), 0.0)
      |      + COALESCE(1.0 / CAST($RrfK + lb.rb AS DOUBLE), 0.0) AS rrf
      |  FROM la FULL OUTER JOIN lb ON la.doc_id = lb.doc_id
      |)
      |SELECT ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rnk,
      |  doc_id, ra AS rank_tf, rb AS rank_coverage, rrf
      |FROM fused
      |ORDER BY rrf DESC, doc_id
      |LIMIT $TopOut""".stripMargin
    }) { t =>
    val w = split(col("text"), " ")
    val tfs = terms.map(q =>
      size(filter(w, x => x === lit(q))).cast("long").as(s"tf_$q"))
    val base = t.documents.select(
      col("doc_id") +: size(w).cast("long").as("dl") +: tfs: _*)
    val feats = base.select(col("doc_id"), col("dl"),
      terms.map(q => col(s"tf_$q")).reduce(_ + _).cast("long").as("tf"),
      terms.map(q => when(col(s"tf_$q") > 0, 1L).otherwise(0L))
        .reduce(_ + _).cast("long").as("nm"))
    val la = feats.filter(col("tf") > 0)
      .orderBy(col("tf").desc, col("doc_id")).limit(K)
      .withColumn("ra",
        row_number().over(Window.orderBy(col("tf").desc, col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("ra"))
    val lb = feats.filter(col("nm") > 0)
      .orderBy(col("nm").desc, col("dl"), col("doc_id")).limit(K)
      .withColumn("rb", row_number().over(
        Window.orderBy(col("nm").desc, col("dl"), col("doc_id")))
          .cast("long"))
      .select(col("doc_id").as("doc_id_b"), col("rb"))
    fuse(la, lb)
      .orderBy(col("rrf").desc, col("doc_id")).limit(TopOut)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("rrf").desc, col("doc_id")))
          .cast("long"))
      .select(col("rnk"), col("doc_id"), col("ra").as("rank_tf"),
        col("rb").as("rank_coverage"), col("rrf"))
      .orderBy(col("rnk"))
  }

  /** RRF combine of two (doc_id, rank) lists — la as (doc_id, ra),
    * lb as (doc_id_b, rb). Factored so the spec can pin the fusion
    * arithmetic (single-list vs both-lists dominance, the missing-
    * entry zero) on hand rankings.
    */
  def fuse(la: org.apache.spark.sql.DataFrame,
      lb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    la.join(lb, col("doc_id") === col("doc_id_b"), "full_outer")
      .select(
        coalesce(col("doc_id"), col("doc_id_b")).as("doc_id"),
        col("ra"), col("rb"),
        (coalesce(lit(1.0) / (lit(RrfK) + col("ra")).cast("double"), lit(0.0))
          + coalesce(lit(1.0) / (lit(RrfK) + col("rb")).cast("double"), lit(0.0)))
          .as("rrf"))

  def all: Seq[Q] = Seq(q230)
}
