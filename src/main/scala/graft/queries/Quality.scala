package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** q84: Gopher-style repetition/quality filters over the documents
  * table — the pretraining-corpus filter class the reference's quality
  * gate (q31) doesn't cover: REPETITION statistics, which need
  * word-multiset structure, not just character counts.
  *
  * Per doc, from one `split(text, ' ')` array and pure array
  * expressions (no explode, no shuffle until the final presentation
  * sort):
  *   - `distinct_ratio`    — |distinct words| / |words| (type-token
  *     ratio; boilerplate and keyword-stuffed docs sit low);
  *   - `top_word_fraction` — multiplicity of the most frequent word /
  *     |words| (the "fraction of text that is the top word" rule);
  *     computed WITHOUT a per-word groupBy: sort the array, then a
  *     single `aggregate` fold finds the longest equal-run — O(w log w)
  *     per row, zero exchange, vs the explode→groupBy(doc,word)→max
  *     shape that ships every word through a corpus-wide shuffle;
  *   - `dup_bigram_fraction` — 1 − |distinct bigrams| / |bigrams|
  *     (duplicate-n-gram mass, the Gopher "dup 2-gram" rule); bigrams
  *     via `zip_with(slice, slice)` so a 1-word doc yields an empty
  *     array (no `sequence(0,-1)` descending-range trap);
  *   - `mean_word_len` — summed word length / |words| (token-quality
  *     proxy; OCR noise and minified blobs sit far from ~4.5).
  *
  * The keep verdict ANDs range gates on all four. Thresholds are
  * binary-representable doubles (0.5, 0.125, 0.0625) and every ratio
  * is a single long/long IEEE division computed by the identical
  * expression on both engines, so the cross-engine compare is
  * tie-free (§6(i) discipline). At 100 TB this is a pure map over the
  * scan — the plan is scan → project → (presentation sort); the fold
  * state is two ints however long the doc is.
  *
  * Oracle deliberately computes `top_word_fraction` the OTHER way
  * (unnest → group → max) — two independent derivations of the same
  * statistic on the two sides of the hash compare.
  */
object Quality {

  val q84 = Q.of(
    "q84_quality_filters",
    """SELECT doc_id, n_words, distinct_ratio, top_word_fraction,
      |  dup_bigram_fraction, mean_word_len,
      |  CASE WHEN n_words >= 20 AND distinct_ratio >= 0.5
      |        AND top_word_fraction <= 0.125 AND dup_bigram_fraction <= 0.0625
      |       THEN 'keep' ELSE 'drop' END AS verdict
      |FROM (
      |  SELECT doc_id, len(w) AS n_words,
      |    CAST(len(list_distinct(w)) AS DOUBLE) / NULLIF(len(w), 0) AS distinct_ratio,
      |    CAST((SELECT max(c) FROM (SELECT count(*) AS c FROM unnest(w) AS t(x) GROUP BY x)) AS DOUBLE)
      |      / NULLIF(len(w), 0) AS top_word_fraction,
      |    COALESCE(1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / NULLIF(len(bi), 0), 0.0) AS dup_bigram_fraction,
      |    CAST(list_aggregate(list_transform(w, x -> length(x)), 'sum') AS DOUBLE)
      |      / NULLIF(len(w), 0) AS mean_word_len
      |  FROM (
      |    SELECT doc_id, string_split(text, ' ') AS w,
      |      list_transform(range(1, len(string_split(text, ' '))),
      |        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]) AS bi
      |    FROM documents
      |  )
      |)
      |ORDER BY doc_id""".stripMargin) { t =>
    repetitionProfile(t.documents).orderBy(col("doc_id"))
  }

  /** (doc_id, text, …) → per-doc repetition metrics + verdict — the
    * q84 body, factored so CurationSpec can drive it with crafted
    * repetitive/diverse documents. Pure projection; adds no exchange.
    */
  def repetitionProfile(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    withVerdict(docs).select(
      col("doc_id"), col("n_words"), col("distinct_ratio"),
      col("top_word_fraction"), col("dup_bigram_fraction"),
      col("mean_word_len"), col("verdict"))

  /** APPENDS the metric + verdict columns, keeping every input column
    * (q90's streaming curation pass needs `lang`/`text` alongside the
    * verdict; q84 projects the report shape from this). Stateless —
    * safe on streaming frames.
    */
  def withVerdict(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("bi", expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> concat(a, ' ', b))"))
      .withColumn("sw", array_sort(col("w")))
      // longest equal-run in the sorted array == max word multiplicity
      .withColumn("top_cnt", expr(
        """CASE WHEN size(w) <= 1 THEN size(w) ELSE
          |  aggregate(sequence(1, size(w) - 1),
          |    named_struct('run', 1, 'best', 1),
          |    (acc, i) -> IF(sw[i] = sw[i - 1],
          |      named_struct('run', acc.run + 1,
          |                   'best', greatest(acc.best, acc.run + 1)),
          |      named_struct('run', 1, 'best', acc.best)),
          |    acc -> acc.best)
          |END""".stripMargin)
        .as("top_cnt"))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("distinct_ratio",
        size(array_distinct(col("w"))).cast("double") /
          nullif(col("n_words"), lit(0L)))
      .withColumn("top_word_fraction",
        col("top_cnt").cast("double") / nullif(col("n_words"), lit(0L)))
      .withColumn("dup_bigram_fraction",
        coalesce(
          lit(1.0) - size(array_distinct(col("bi"))).cast("double") /
            nullif(size(col("bi")).cast("long"), lit(0L)),
          lit(0.0)))
      .withColumn("mean_word_len",
        expr("aggregate(w, 0L, (a, x) -> a + length(x))").cast("double") /
          nullif(col("n_words"), lit(0L)))
      .withColumn("verdict",
        when(col("n_words") >= 20 && col("distinct_ratio") >= 0.5 &&
          col("top_word_fraction") <= 0.125 && col("dup_bigram_fraction") <= 0.0625,
          "keep").otherwise("drop"))
      .drop("w", "bi", "sw", "top_cnt")
  }

  def all: Seq[Q] = Seq(q84)
}
