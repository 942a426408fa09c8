package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det.D18_6

/** q131: DISTRIBUTION DRIFT per source — smoothed KL divergence of
  * each source's token distribution from the corpus-wide one, the
  * monitoring statistic a training-data pipeline alarms on when one
  * feed starts emitting template spam, a new language, or truncated
  * documents (the distributional twin of q93's row-level data-quality
  * ledger): KL(p_src ‖ p_corpus) = Σ_tok p·ln(p/q) with add-1
  * smoothing over the corpus vocabulary, so the sum runs over the
  * FULL source×vocab grid — tokens a source never emits still
  * contribute (that absence IS drift).
  *
  * Scale shape: one token explode → ONE map-side-combined (source,
  * token) aggregate whose output is bounded by |sources|·|vocab|,
  * never the fact; corpus marginals, per-source totals, and the
  * vocabulary size are windows OVER that bounded frame; the full
  * grid is a broadcast cross of two bounded dims (sources × vocab)
  * left-joined to the observed counts, so zero-count cells
  * materialize without a fact-sized scan. At 100 TB with an open
  * vocabulary the documented swap is hashed buckets (q129's md5
  * feature space) — the grid stays 256-wide per source regardless.
  *
  * Determinism: counts exact integers; the per-cell ln term is
  * quantized to DECIMAL(18,6) before an exact integer-weighted
  * decimal sum and ONE final double division from bit-identical
  * operands (the q129 half-tie lesson — no final round; the
  * quantization surface is |grid| cells, not rows). The 1e-6 term
  * quantization can push a truly-identical source's KL a hair below
  * zero; Gibbs holds to that tolerance.
  */
object Drift {

  /** Per-source smoothed KL from the corpus distribution over the
    * full source×vocab grid. Factored so the spec can pin a
    * hand-computed two-token drift and the identical-distribution
    * zero.
    */
  def sourceDrift(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val st = toks.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c_st"))
    val vocab = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
      .withColumn("n_corpus", sum(col("c_t")).over(Window.partitionBy()))
      .withColumn("v", count(lit(1)).over(Window.partitionBy()))
    val sources = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_src"))
    // bounded dims crossed → every (source, token) cell exists
    val grid = broadcast(sources).crossJoin(broadcast(vocab))
      .join(st, Seq("source", "tok"), "left")
      .na.fill(0L, Seq("c_st"))
    // p = (c_st+1)/(n_src+v), q = (c_t+1)/(n_corpus+v);
    // Σ p·ln(p/q) = (Σ (c_st+1)·term) / (n_src+v) with the per-cell
    // ln term quantized to decimal BEFORE the exact integer-weighted
    // sum and ONE double division at the end (the q129 tie lesson:
    // never round an exact decimal sum, quantize at the cell surface)
    val ratio = ((col("c_st") + 1) * (col("n_corpus") + col("v"))).cast("double") /
      ((col("c_t") + 1) * (col("n_src") + col("v"))).cast("double")
    grid
      .withColumn("term", log(ratio).cast(D18_6))
      .groupBy(col("source"))
      .agg(
        max(col("n_src")).as("n_tok"),
        sum(when(col("c_st") > 0, 1L).otherwise(0L)).as("n_vocab_used"),
        max(col("v")).as("n_vocab"),
        (sum(col("term") * (col("c_st") + 1)).cast("double") /
          (max(col("n_src")) + max(col("v"))).cast("double")).as("kl"))
  }

  val q131 = Q.of(
    "q131_source_drift",
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
      |), st AS (
      |  SELECT source, tok, COUNT(*) AS c_st FROM toks GROUP BY 1, 2
      |), vocab AS (
      |  SELECT tok, c_t, CAST(SUM(c_t) OVER () AS BIGINT) AS n_corpus,
      |    COUNT(*) OVER () AS v
      |  FROM (SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok)
      |), sources AS (
      |  SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_src FROM st GROUP BY source
      |), grid AS (
      |  SELECT s.source, s.n_src, vb.tok, vb.c_t, vb.n_corpus, vb.v,
      |    COALESCE(st.c_st, 0) AS c_st
      |  FROM sources s CROSS JOIN vocab vb
      |  LEFT JOIN st ON st.source = s.source AND st.tok = vb.tok
      |)
      |SELECT source,
      |  MAX(n_src) AS n_tok,
      |  CAST(SUM(CASE WHEN c_st > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_vocab_used,
      |  CAST(MAX(v) AS BIGINT) AS n_vocab,
      |  CAST(SUM(
      |    CAST(ln(CAST((c_st + 1) * (n_corpus + v) AS DOUBLE)
      |            / CAST((c_t + 1) * (n_src + v) AS DOUBLE))
      |      AS DECIMAL(18,6)) * (c_st + 1)) AS DOUBLE)
      |    / CAST(MAX(n_src) + MAX(v) AS DOUBLE) AS kl
      |FROM grid
      |GROUP BY source
      |ORDER BY source""".stripMargin) { t =>
    sourceDrift(t.documents).orderBy(col("source"))
  }

  def all: Seq[Q] = Seq(q131)
}
