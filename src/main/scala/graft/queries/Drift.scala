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
  * FULL vocabulary — tokens a source never emits still contribute
  * (that absence IS drift).
  *
  * Scale shape — NO source×vocab grid is ever materialized (the
  * PlanHygiene rule: a broadcast nested-loop over two data-derived
  * dims is not plan-provably tiny): the absent-token mass has a
  * CLOSED FORM. For an absent token, term₀(tok) = ln(n_corpus+v) −
  * ln(c_t+1) − ln(n_src+v), so Σ_absent term₀ = (v−v_used)·(lnC −
  * lnS) − (S_all − S_present) where S_all = Σ_vocab ln(c_t+1) is a
  * corpus scalar and S_present its per-source partial. The plan is:
  * one map-side-combined (source, token) aggregate (the only
  * fact-sized exchange), a token-keyed equi-join to the vocab frame
  * (AQE broadcasts the small side — a hash join, not a BNLJ), a
  * one-row global-aggregate scalar frame crossed in (provably tiny
  * by construction), and one bounded per-source rollup. At 100 TB
  * with an open vocabulary the documented swap is hashed buckets
  * (q129's md5 feature space).
  *
  * Determinism: counts exact integers; every transcendental — the
  * per-present-cell ratio term, lnC, lnS, and the per-token
  * ln(c_t+1) — is quantized to DECIMAL(18,6) at its bounded surface,
  * all composition is exact integer-weighted decimal arithmetic,
  * and ONE final double division runs on bit-identical operands (the
  * q129 half-tie lesson — no final round). The 1e-6 term
  * quantization can push a truly-identical source's KL a hair below
  * zero; Gibbs holds to that tolerance.
  */
object Drift {

  /** Per-source smoothed KL from the corpus distribution over the
    * full vocabulary (absent tokens via the closed-form correction).
    * Factored so the spec can pin a hand-computed two-token drift
    * and the drifted-source contrast.
    */
  def sourceDrift(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val st = toks.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c_st"))
    val vocab = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
      .withColumn("ln_t", log((col("c_t") + 1).cast("double")).cast(D18_6))
    // one row by construction — the allowed crossJoin(broadcast) shape
    val scal = vocab.agg(
      sum(col("c_t")).as("n_corpus"),
      count(lit(1)).as("v"),
      sum(col("ln_t")).as("s_all"))
    val prs = st
      .withColumn("n_src", sum(col("c_st")).over(Window.partitionBy(col("source"))))
      .join(vocab, Seq("tok"))
      .crossJoin(broadcast(scal))
    val ratio = ((col("c_st") + 1) * (col("n_corpus") + col("v"))).cast("double") /
      ((col("c_t") + 1) * (col("n_src") + col("v"))).cast("double")
    val cells = prs
      .withColumn("term", log(ratio).cast(D18_6))
      .withColumn("ln_c", log((col("n_corpus") + col("v")).cast("double")).cast(D18_6))
      .withColumn("ln_s", log((col("n_src") + col("v")).cast("double")).cast(D18_6))
    cells
      .groupBy(col("source"))
      .agg(
        max(col("n_src")).as("n_tok"),
        count(lit(1)).as("n_vocab_used"),
        max(col("v")).as("n_vocab"),
        ((sum(col("term") * (col("c_st") + 1)) +
          (max(col("v")) - count(lit(1))) * (max(col("ln_c")) - max(col("ln_s"))) -
          (max(col("s_all")) - sum(col("ln_t")))).cast("double") /
          (max(col("n_src")) + max(col("v"))).cast("double")).as("kl"))
  }

  val q131 = Q.of(
    "q131_source_drift",
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
      |), st AS (
      |  SELECT source, tok, COUNT(*) AS c_st FROM toks GROUP BY 1, 2
      |), vocab AS (
      |  SELECT tok, c_t, CAST(ln(CAST(c_t + 1 AS DOUBLE)) AS DECIMAL(18,6)) AS ln_t
      |  FROM (SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok)
      |), scal AS (
      |  SELECT CAST(SUM(c_t) AS BIGINT) AS n_corpus, COUNT(*) AS v,
      |    CAST(SUM(ln_t) AS DECIMAL(38,6)) AS s_all
      |  FROM vocab
      |), prs AS (
      |  SELECT st.source, st.c_st, vb.c_t, vb.ln_t, s.n_corpus, s.v, s.s_all,
      |    CAST(SUM(st.c_st) OVER (PARTITION BY st.source) AS BIGINT) AS n_src
      |  FROM st JOIN vocab vb USING (tok) CROSS JOIN scal s
      |)
      |SELECT source,
      |  MAX(n_src) AS n_tok,
      |  CAST(COUNT(*) AS BIGINT) AS n_vocab_used,
      |  CAST(MAX(v) AS BIGINT) AS n_vocab,
      |  CAST(
      |    SUM(CAST(ln(CAST((c_st + 1) * (n_corpus + v) AS DOUBLE)
      |              / CAST((c_t + 1) * (n_src + v) AS DOUBLE))
      |        AS DECIMAL(18,6)) * (c_st + 1))
      |    + (MAX(v) - COUNT(*)) *
      |      (CAST(ln(CAST(MAX(n_corpus) + MAX(v) AS DOUBLE)) AS DECIMAL(18,6))
      |       - CAST(ln(CAST(MAX(n_src) + MAX(v) AS DOUBLE)) AS DECIMAL(18,6)))
      |    - (MAX(s_all) - CAST(SUM(ln_t) AS DECIMAL(38,6)))
      |  AS DOUBLE)
      |  / CAST(MAX(n_src) + MAX(v) AS DOUBLE) AS kl
      |FROM prs
      |GROUP BY source
      |ORDER BY source""".stripMargin) { t =>
    sourceDrift(t.documents).orderBy(col("source"))
  }

  def all: Seq[Q] = Seq(q131)
}
