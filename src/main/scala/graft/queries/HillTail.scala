package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q244: HILL TAIL-INDEX estimator over per-source token frequencies
  * (Hill 1975, public) — the MLE companion to q207's Zipf OLS fit:
  * the OLS slope over the whole rank spectrum is biased by the
  * non-power-law head and by rank-space correlation; the Hill
  * estimator α̂ = (k−1)/Σᵢ₌₁ᵏ⁻¹ ln(xᵢ/xₖ) uses only the top-k order
  * statistics, where the power law actually lives — the estimator a
  * heavy-tail audit quotes, and the (q207 vs q244) disagreement is
  * itself the "head contaminated the fit" diagnostic.
  *
  * Determinism: frequencies are exact integers ranked by a total
  * (count DESC, term) order; the ln terms ride log2 (the engine-
  * matched transcendental) quantized D18_6 per order statistic
  * before the exact decimal sum (the q129 rule), and α̂ rescales by
  * the ln 2 literal written identically on both sides (q216 literal
  * parity): α̂ = (k−1)/(Σ log2 · 0.6931471805599453).
  *
  * Scale shape: token explode → (source, term) fold (vocab-bounded);
  * the rank window runs per source over the vocab; only the top
  * k+1 = 101 rows survive to the fold. |sources| rows out.
  */
object HillTail {

  private val K = 100
  private val Ln2 = "0.6931471805599453"

  val q244 = Q.of(
    "q244_hill_tail",
    s"""WITH tc AS (
      |  SELECT source, term, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS term
      |    FROM documents WHERE length(trim(text)) > 0
      |  ) GROUP BY 1, 2
      |), ranked AS (
      |  SELECT source, c,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |                       ORDER BY c DESC, term) AS rnk,
      |    COUNT(*) OVER (PARTITION BY source) AS vocab
      |  FROM tc
      |), kk AS (
      |  SELECT source,
      |    CASE WHEN vocab > ${K + 1} THEN ${K + 1} ELSE vocab END AS kth
      |  FROM ranked WHERE rnk = 1 AND vocab >= 3
      |), thr AS (
      |  SELECT ranked.source, ranked.c AS xk, kk.kth
      |  FROM ranked JOIN kk
      |    ON kk.source = ranked.source AND ranked.rnk = kk.kth
      |), terms AS (
      |  SELECT ranked.source,
      |    CAST(log2(CAST(ranked.c AS DOUBLE) / CAST(thr.xk AS DOUBLE))
      |      AS DECIMAL(18,6)) AS lq
      |  FROM ranked JOIN thr ON thr.source = ranked.source
      |  WHERE ranked.rnk < thr.kth
      |)
      |SELECT source, COUNT(*) AS k_used,
      |  CASE WHEN SUM(lq) = 0 THEN NULL
      |    ELSE CAST(COUNT(*) AS DOUBLE)
      |      / (CAST(SUM(lq) AS DOUBLE) * $Ln2) END AS hill_alpha
      |FROM terms GROUP BY source
      |ORDER BY source""".stripMargin) { t =>
    hill(t.documents)
  }

  /** The Hill fold over a (source, text) frame. Factored so the spec
    * can pin the exact-Pareto closed form (x_i = x_k·2^{(k-i)/α'}
    * recovers α') and the rank-tiebreak determinism.
    */
  def hill(docs: DataFrame): DataFrame = {
    val tc = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
    hillOnCounts(tc)
  }

  /** Same fold over precomputed (source, term, c) counts. The
    * threshold rank adapts to tiny vocabularies: kth = min(K+1,
    * vocab), sources with vocab < 3 drop out (no tail to estimate).
    */
  def hillOnCounts(tc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("term"))
    val ranked = tc.select(col("source"), col("term"), col("c"))
      .withColumn("rnk", row_number().over(w))
      .withColumn("vocab",
        count(lit(1)).over(Window.partitionBy(col("source"))))
    val rankedC = graft.CacheScope.trackedCache(
      ranked.filter(col("rnk") <= K + 1)
        .select(col("source"), col("c"), col("rnk"), col("vocab")))
    val kk = rankedC.filter(col("rnk") === 1 && col("vocab") >= 3)
      .select(col("source"),
        when(col("vocab") > K + 1, lit((K + 1).toLong))
          .otherwise(col("vocab")).as("kth"))
    val thr = rankedC.join(kk, Seq("source"))
      .filter(col("rnk") === col("kth"))
      .select(col("source"), col("c").as("xk"), col("kth"))
    val terms = rankedC
      .join(thr, Seq("source"))
      .filter(col("rnk") < col("kth"))
      .select(col("source"),
        log2(col("c").cast("double") / col("xk").cast("double"))
          .cast(det.D18_6).as("lq"))
    // flat-spectrum guard: all top-(kth−1) counts equal to x_k makes
    // SUM(lq) = 0 — Spark would emit Infinity where DuckDB yields NULL
    // on 1/0, so both sides guard the degenerate fold to NULL (§6, the
    // q203 degenerate-guard pattern)
    terms.groupBy(col("source"))
      .agg(count(lit(1)).as("k_used"),
        when(sum(col("lq")) =!= 0,
          count(lit(1)).cast("double")
            / (sum(col("lq")).cast("double") * lit(0.6931471805599453)))
          .as("hill_alpha"))
      .orderBy(col("source"))
  }

  def all: Seq[Q] = Seq(q244)
}
