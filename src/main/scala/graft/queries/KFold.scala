package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q249: STRATIFIED K-FOLD assignment audit (standard CV design,
  * public) — the evaluation-design member of the split tier: q79
  * cuts one train/test split by content hash; k-fold cross-validation
  * needs EVERY doc in exactly one of K folds with each stratum
  * (language here) split evenly across folds — naive per-row
  * hash-mod gives binomial fold sizes and can starve a rare stratum
  * in some fold. The assignment: rank docs within each stratum by
  * (md5(text), doc_id) — content-keyed, so reproducible across
  * engines and ingestion order — and deal fold = (rank − 1) mod K;
  * per-stratum fold sizes then differ by AT MOST ONE, by
  * construction. Emits the (lang, fold) audit grid with token mass
  * and the per-stratum size spread.
  *
  * Pure integer arithmetic + the md5 ordering — zero floats. The
  * rank is a per-stratum window (strata are the parallel unit; a
  * stratum big enough to collapse one window task would rank via
  * PrefixSum, the q236 swap).
  */
object KFold {

  private val K = 5

  val q249 = Q.of(
    "q249_kfold_assign",
    s"""WITH ranked AS (
      |  SELECT lang, doc_id,
      |    len(string_split_regex(trim(text), '\\s+')) AS n_tok,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(text), doc_id) AS r
      |  FROM documents WHERE length(trim(text)) > 0
      |), assigned AS (
      |  SELECT lang, (r - 1) % $K AS fold, doc_id, n_tok FROM ranked
      |), grid AS (
      |  SELECT lang, fold, COUNT(*) AS n_docs,
      |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |  FROM assigned GROUP BY 1, 2
      |), spread AS (
      |  SELECT lang, CAST(MAX(n_docs) - MIN(n_docs) AS BIGINT) AS size_spread
      |  FROM grid GROUP BY 1
      |)
      |SELECT grid.lang, grid.fold, grid.n_docs, grid.n_tokens,
      |  spread.size_spread
      |FROM grid JOIN spread ON spread.lang = grid.lang
      |ORDER BY grid.lang, grid.fold""".stripMargin) { t =>
    assign(t.documents)
  }

  /** The fold-assignment audit over a (doc_id, lang, text) frame.
    * Factored so the spec can pin the ≤ 1 spread invariant for every
    * stratum size residue and assignment determinism.
    */
  def assign(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("text")), col("doc_id"))
    val assigned = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("lang"), col("doc_id"), col("text"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .withColumn("fold", (row_number().over(w) - 1).cast("long") % K)
      .drop("text")
    val grid = assigned.groupBy(col("lang"), col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"))
    val spread = grid.groupBy(col("lang"))
      .agg((max(col("n_docs")) - min(col("n_docs"))).cast("long")
        .as("size_spread"))
    grid.join(spread, Seq("lang"))
      .select(col("lang"), col("fold"), col("n_docs"), col("n_tokens"),
        col("size_spread"))
      .orderBy(col("lang"), col("fold"))
  }

  def all: Seq[Q] = Seq(q249)
}
