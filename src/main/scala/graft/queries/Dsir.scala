package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det.D18_6

/** q129: DSIR-style IMPORTANCE WEIGHTS — data selection by importance
  * resampling (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", public NeurIPS 2023 method): score every
  * document by how much its hashed-feature distribution looks like a
  * TARGET domain rather than the RAW corpus, log p_target(doc) −
  * p_raw(doc) under bag-of-hashed-unigram models. The q113 mixture
  * sampler reweights by SOURCE LABEL; DSIR reweights by CONTENT — the
  * tool for "more like this high-quality slice" when no label exists.
  *
  * Feature hashing, cross-engine: bucket = first two hex chars of
  * md5(token) — 256 buckets, the engine-agnostic hash the q79/q113
  * thresholds already rely on (Spark xxhash64 has no DuckDB twin).
  * Add-1 smoothing over the 256-bucket space; weight(doc) =
  * Σ_b n_db · [ln((ct_b+1)·(R+256)) − ln((cr_b+1)·(T+256))] where
  * ct/cr are target/raw bucket totals and T/R their sums.
  *
  * Scale shape: ONE token explode feeds both the per-(doc, bucket)
  * frame (map-side combined; ≤256 rows per doc) and the global
  * bucket frame (256 rows — target and raw counts in the SAME pass
  * via a conditional sum, totals as windows over the bounded frame);
  * the bucket model is BROADCAST back, and the weight is one
  * doc-keyed rollup. No fact-sized exchange carries anything wider
  * than (doc_id, bucket, count).
  *
  * Determinism: counts are exact integers; the PER-BUCKET ln term
  * (≤256 distinct values per model) is quantized to DECIMAL(18,6)
  * BEFORE the integer multiply — last-ulp libm differences vanish at
  * the 6-decimal round on a few hundred values, then term·n_db and
  * the per-doc sum are exact decimal arithmetic, and the final
  * double cast of an exact decimal is bit-identical cross-engine.
  * Deliberately NO final `round(…, 4)`: a 6-decimal exact sum lands
  * on a 4-decimal HALF-TIE with probability ~1/100 per row, and
  * Spark's decimal-string HALF_UP disagrees with DuckDB's binary
  * rounding exactly there (observed at sf0.1, doc 220, −0.166450).
  */
object Dsir {

  private val TargetSources = Seq("src1", "src2", "src3")

  /** Per-doc log importance weight of `docs` toward the
    * `isTarget`-marked slice. Factored so the spec can pin a
    * hand-computed two-bucket model and the smoothing floor.
    */
  def importanceWeights(docs: DataFrame, isTarget: org.apache.spark.sql.Column): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("source"), isTarget.as("graft_t"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("b", substring(md5(col("tok")), 1, 2))
    val perDocBucket = toks
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("n_db"))
    val buckets = toks
      .groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("graft_t"), 1L).otherwise(0L)).as("ct"))
      .withColumn("r_tot", sum(col("cr")).over(Window.partitionBy()))
      .withColumn("t_tot", sum(col("ct")).over(Window.partitionBy()))
    perDocBucket
      .join(broadcast(buckets), Seq("b"))
      .withColumn("term",
        (log(((col("ct") + 1) * (col("r_tot") + 256)).cast("double")) -
          log(((col("cr") + 1) * (col("t_tot") + 256)).cast("double")))
          .cast(D18_6))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("n_db")).as("n_tok"),
        sum(col("term") * col("n_db")).cast("double").as("w"))
      .withColumn("keep", col("w") > 0)
  }

  val q129 = Q.of(
    "q129_dsir_weights",
    s"""WITH tb AS (
      |  SELECT doc_id, source,
      |    source IN ('${TargetSources.mkString("','")}') AS t,
      |    substr(md5(unnest(string_split(text, ' '))), 1, 2) AS b
      |  FROM documents
      |), pdb AS (
      |  SELECT doc_id, source, b, COUNT(*) AS n_db FROM tb GROUP BY 1, 2, 3
      |), bk AS (
      |  SELECT b, COUNT(*) AS cr,
      |    CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS ct
      |  FROM tb GROUP BY b
      |), bk2 AS (
      |  SELECT b, cr, ct,
      |    CAST(SUM(cr) OVER () AS BIGINT) AS r_tot,
      |    CAST(SUM(ct) OVER () AS BIGINT) AS t_tot
      |  FROM bk
      |)
      |SELECT doc_id, source, n_tok, w, w > 0 AS keep FROM (
      |  SELECT doc_id, source,
      |    CAST(SUM(n_db) AS BIGINT) AS n_tok,
      |    CAST(SUM(
      |      CAST(ln(CAST((ct + 1) * (r_tot + 256) AS DOUBLE))
      |           - ln(CAST((cr + 1) * (t_tot + 256) AS DOUBLE))
      |        AS DECIMAL(18,6)) * n_db) AS DOUBLE) AS w
      |  FROM pdb JOIN bk2 USING (b)
      |  GROUP BY doc_id, source
      |)
      |ORDER BY doc_id""".stripMargin) { t =>
    importanceWeights(t.documents, col("source").isin(TargetSources: _*))
      .orderBy(col("doc_id"))
  }

  def all: Seq[Q] = Seq(q129)
}
