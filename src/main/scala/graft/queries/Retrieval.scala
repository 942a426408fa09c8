package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** q97: BM25 keyword retrieval — the lexical twin of the ANN tier
  * (q50–q54/q83/q88/q89): top-k documents for a FIXED query-term set
  * under Okapi BM25 (k1=1.2, b=0.75) with Lucene's `ln(1 + …)` idf
  * (positive even at df > N/2 — this corpus's common terms sit there).
  *
  * Scale shape (100 TB corpus, fixed query): the corpus NEVER
  * shuffles. Per-doc term frequencies are array folds over one
  * `split(text)` (`size(filter(w, x -> x = t))` per term — the q84
  * no-explode doctrine), corpus stats (N, total tokens, per-term df)
  * are ONE one-row aggregate broadcast back, scoring is a pure
  * projection, and the top-k is a TakeOrdered over (score, doc_id) —
  * scan → project → 1-row agg → project → top-k. An inverted-index
  * shuffle (explode → groupBy term) is only worth building when the
  * query stream is unbounded; for a fixed filter-style term set this
  * is the q91 zero-join doctrine applied to scoring.
  *
  * Determinism (§6): every tf/dl/df/N/T is exact integer arithmetic;
  * saturation denominators are single-expression double chains with
  * binary-exact literals evaluated in the SAME order both engines;
  * the per-doc score adds the per-term contributions in FIXED literal
  * order (no data-order float sum). The ONLY transcendental is the
  * per-term `ln`, so the score is rounded to 4 decimals (§6(b));
  * ordering is (rounded score desc, doc_id) — total and tie-stable.
  */
object Retrieval {

  /** The fixed query — real corpus terms spanning the df range. */
  val terms: Seq[String] = Seq("vector", "spark", "merge", "slow")

  val topK = 100

  private def oracleSql: String = {
    val tfCols = terms.map(t =>
      s"len(list_filter(string_split(text, ' '), x -> x = '$t')) AS tf_$t")
      .mkString(",\n      |    ")
    val dfCols = terms.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
      .mkString(",\n      |    ")
    val contribs = terms.map(t =>
      s"""ln(CAST(1 AS DOUBLE) + (CAST(n - df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5))
      |      * ((CAST(tf_$t AS DOUBLE) * 2.2)
      |         / (CAST(tf_$t AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl * n AS DOUBLE) / CAST(tt AS DOUBLE)))))""")
      .mkString("\n      |    + ")
    val matched = terms.map(t => s"CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH base AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
      |    $tfCols
      |  FROM documents
      |), stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tt,
      |    $dfCols
      |  FROM base
      |)
      |SELECT doc_id, dl, matched_terms, score_r FROM (
      |  SELECT doc_id, dl,
      |    CAST($matched AS BIGINT) AS matched_terms,
      |    round(
      |    $contribs, 4) AS score_r
      |  FROM base, stats
      |)
      |ORDER BY score_r DESC, doc_id
      |LIMIT $topK""".stripMargin
  }

  val q97 = Q.of("q97_bm25", oracleSql) { t =>
    search(t.documents)
  }

  /** The scoring pipeline, factored so a spec can drive it on crafted
    * corpora (term-stuffed vs absent, length normalization direction).
    */
  def search(docs: DataFrame): DataFrame = {
    val base = docs
      .withColumn("w", split(col("text"), " "))
      .select(
        (col("doc_id") +: size(col("w")).cast("long").as("dl") +:
          terms.map(t =>
            expr(s"size(filter(w, x -> x = '$t'))").cast("long")
              .as(s"tf_$t"))): _*)
    val statCols = sum("dl").cast("long").as("tt") +:
      terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1).otherwise(0)).cast("long")
          .as(s"df_$t"))
    val stats = base.agg(count(lit(1)).cast("long").as("n"), statCols: _*)
    val withStats = base.crossJoin(broadcast(stats)) // one-row stats frame
    val contribs: Seq[Column] = terms.map { t =>
      val dfT = col(s"df_$t")
      val tfD = col(s"tf_$t").cast("double")
      val idf = log(lit(1.0) +
        ((col("n") - dfT).cast("double") + lit(0.5)) /
          (dfT.cast("double") + lit(0.5)))
      val den = tfD + lit(1.2) * (lit(0.25) +
        lit(0.75) * ((col("dl") * col("n")).cast("double") /
          col("tt").cast("double")))
      idf * ((tfD * lit(2.2)) / den)
    }
    val matched = terms.map(t =>
      when(col(s"tf_$t") > 0, 1).otherwise(0): Column)
      .reduce(_ + _).cast("long")
    withStats
      .select(col("doc_id"), col("dl"),
        matched.as("matched_terms"),
        round(contribs.reduce(_ + _), 4).as("score_r"))
      .orderBy(col("score_r").desc, col("doc_id"))
      .limit(topK)
  }

  def all: Seq[Q] = Seq(q97)
}
