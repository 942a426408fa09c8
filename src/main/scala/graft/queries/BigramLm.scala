package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q183: BIGRAM-LM HELD-OUT scoring — train an add-1-smoothed bigram
  * model on a deterministic 80% split of the corpus, score every
  * held-out document by its mean conditional token probability: the
  * two-leg (train ≠ score) generalization of q95's self-corpus
  * unigram signal, and the shape of the CCNet perplexity filter with
  * the n-gram order dropped to 2 and the log dropped entirely.
  *
  * Determinism contract (§6(i), the q95 rule): NO transcendentals —
  * each p(w₂|w₁) = (c₂+1)/(c₁+V) is ONE IEEE division of exact
  * integers (correctly rounded, bit-identical both engines, unlike
  * ln), quantized to D20_6 so the per-doc sum is order-independent,
  * and the mean is one final division. Unseen bigram → 1/(c₁+V);
  * unseen context → 1/V — add-1 smoothing handles both without
  * branches that could diverge.
  *
  * Scale shape: bigrams come from an ARRAY-TRANSFORM projection over
  * the token array (adjacent-pair struct list — scan-local, no
  * self-join, no posexplode join-back); the model build is one
  * map-side-combined (w₁, w₂) aggregate (distinct bigrams cross the
  * exchange, not the token stream) plus a context rollup and a
  * one-row vocab count; scoring is the held pair stream joined to
  * the bigram and context tables on their natural keys (sort-merge
  * at corpus scale — the model tables are vocab-sized, genuinely too
  * big to broadcast at 100 TB) and ONE doc_id re-aggregate. The md5
  * split (q79 device) pushes into both scans.
  */
object BigramLm {

  /** Adjacent-pair frame: (doc_id, w1, w2) per bigram occurrence.
    * Single-token docs are filtered BEFORE the transform: Spark's
    * `sequence(1, 0)` is a descending range (not empty like DuckDB's
    * generate_series), so an unguarded size-1 doc would probe index 0.
    */
  def bigrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("graft_t"))
      .filter(size(col("graft_t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(graft_t) - 1)," +
          " i -> struct(element_at(graft_t, i) AS w1," +
          " element_at(graft_t, i + 1) AS w2))")).as("graft_b"))
      .select(col("doc_id"), col("graft_b.w1"), col("graft_b.w2"))

  /** Train on `train`, score `held`: per held doc, bigram count,
    * seen-bigram count, and mean smoothed conditional probability.
    * Factored so the spec can pin hand-computed probabilities, the
    * unseen-bigram and unseen-context floors, and train/score
    * isolation (a held-only bigram must not train the model).
    */
  def score(train: DataFrame, held: DataFrame): DataFrame = {
    val c2 = bigrams(train)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("graft_c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("graft_c2")).as("graft_c1"))
    val vocab = train
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(count_distinct(col("w")).as("graft_v"))
    val p = (coalesce(col("graft_c2"), lit(0L)) + 1L).cast("double") /
      (coalesce(col("graft_c1"), lit(0L)) + col("graft_v")).cast("double")
    bigrams(held)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(col("graft_c2")).as("n_seen"),
        sum(p.cast(det.D20_6)).as("graft_sp"))
      .select(col("doc_id"), col("n_bigrams"), col("n_seen"),
        (col("graft_sp").cast("double") / col("n_bigrams")).as("mean_p"))
  }

  val q183 = Q.of(
    "q183_bigram_lm",
    """WITH d AS (
      |  SELECT doc_id, text, md5(text) < 'cccd' AS is_train FROM documents
      |), pairs AS (
      |  SELECT doc_id, is_train, t[i] AS w1, t[i + 1] AS w2
      |  FROM (SELECT doc_id, is_train, string_split(text, ' ') AS t FROM d),
      |    UNNEST(generate_series(1, len(t) - 1)) AS u(i)
      |), c2 AS (
      |  SELECT w1, w2, COUNT(*) AS c2 FROM pairs WHERE is_train GROUP BY 1, 2
      |), c1 AS (
      |  SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1
      |), v AS (
      |  SELECT COUNT(DISTINCT w) AS v
      |  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM d WHERE is_train)
      |)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(COUNT(c2.c2) AS BIGINT) AS n_seen,
      |  CAST(SUM(CAST(
      |      CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE) /
      |      CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)
      |    AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS mean_p
      |FROM pairs
      |LEFT JOIN c2 USING (w1, w2)
      |LEFT JOIN c1 USING (w1)
      |CROSS JOIN v
      |WHERE NOT is_train
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { t =>
    val d = t.documents.select(col("doc_id"), col("text"),
      (md5(col("text")) < "cccd").as("graft_train"))
    score(d.filter(col("graft_train")), d.filter(!col("graft_train")))
      .orderBy(col("doc_id"))
  }

  def all: Seq[Q] = Seq(q183)
}
