package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q228: DISTINCTIVE-TERM extraction per source via log-odds with an
  * informative Dirichlet prior (Monroe–Colaresi–Quinn "Fightin'
  * Words" 2008, public) — the keyword-extraction member of the text
  * tier. Raw tf-idf and PMI (q127) both explode on rare terms; the
  * Dirichlet prior (α_w = a₀·y_w/n, total mass a₀ = 1000 drawn from
  * the corpus itself) shrinks every source's term odds toward the
  * corpus distribution, and the z-score δ/√(1/(y_iw+α_w) +
  * 1/(y_jw+α_w)) ranks terms by EVIDENCE of over-use, not raw rate —
  * the standard "what words does this source actually fight with"
  * readout a corpus card wants per slice.
  *
  * Determinism: every per-(source, term) input is an exact integer
  * count; α and the z denominator are ONE fixed IEEE chain over those
  * integers written token-identically on both engines (1/x and sqrt
  * are correctly-rounded IEEE ops — bit-identical). δ subtracts two
  * log2 calls whose arguments are nearly equal, so the engines'
  * last-bit log2 disagreement SURVIVES the cancellation (measured:
  * 1e-15 absolute at sf0.001) — the q129/q227 rule applies: the
  * log2-derived δ is quantized to D18_6 once, and z = δ_q/sd is then
  * a single IEEE division of cross-engine-identical inputs (δ is in
  * log2-odds units, a uniform 1/ln2 rescale of the paper's
  * natural-log form that preserves every ranking). The top-10 window
  * orders by (z DESC, term) — the term tiebreak makes the cut
  * deterministic even under exact z ties at the 1e-6 grain.
  *
  * Scale shape (the q193 lesson applied from birth): the corpus-wide
  * term frame tw is aggregated ONCE, and the evidence floor
  * y_iw ≥ 5 prunes the per-source candidate frame BEFORE the term
  * join, so the shuffle carries only terms that can possibly rank —
  * no forced broadcast anywhere (source totals are a 20-row AQE
  * broadcast; the term join is linear in vocab, the postings floor).
  * Output is ≤ 10 rows × |sources|.
  */
object LogOdds {

  private val A0 = "1000.0"
  private val MinCount = 5

  val q228 = Q.of(
    "q228_distinctive_terms",
    s"""WITH toks AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS term
      |  FROM documents WHERE length(trim(text)) > 0
      |), ts AS (
      |  SELECT source, term, COUNT(*) AS yi FROM toks GROUP BY 1, 2
      |), tw AS (
      |  SELECT term, CAST(SUM(yi) AS BIGINT) AS yw FROM ts GROUP BY 1
      |), ns AS (
      |  SELECT source, CAST(SUM(yi) AS BIGINT) AS ni FROM ts GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(yi) AS BIGINT) AS n FROM ts
      |), cand AS (
      |  SELECT ts.source, ts.term, ts.yi, tw.yw - ts.yi AS yj, ns.ni,
      |    tot.n - ns.ni AS nj,
      |    $A0 * CAST(tw.yw AS DOUBLE) / CAST(tot.n AS DOUBLE) AS alpha
      |  FROM ts JOIN tw ON tw.term = ts.term
      |  JOIN ns ON ns.source = ts.source CROSS JOIN tot
      |  WHERE ts.yi >= $MinCount
      |), z AS (
      |  SELECT source, term, yi AS y_src, yj AS y_rest,
      |    CAST(log2((CAST(yi AS DOUBLE) + alpha)
      |         / (CAST(ni AS DOUBLE) + $A0 - CAST(yi AS DOUBLE) - alpha))
      |    - log2((CAST(yj AS DOUBLE) + alpha)
      |         / (CAST(nj AS DOUBLE) + $A0 - CAST(yj AS DOUBLE) - alpha))
      |      AS DECIMAL(18,6)) AS dq,
      |    sqrt(1.0 / (CAST(yi AS DOUBLE) + alpha)
      |       + 1.0 / (CAST(yj AS DOUBLE) + alpha)) AS sd
      |  FROM cand
      |), ranked AS (
      |  SELECT source, term, y_src, y_rest,
      |    CAST(dq AS DOUBLE) AS delta_log2,
      |    CAST(dq AS DOUBLE) / sd AS zscore,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |                       ORDER BY CAST(dq AS DOUBLE) / sd DESC, term) AS rnk
      |  FROM z
      |)
      |SELECT source, rnk, term, y_src, y_rest, delta_log2, zscore
      |FROM ranked WHERE rnk <= 10
      |ORDER BY source, rnk""".stripMargin) { t =>
    topTerms(t.documents)
  }

  /** The full scoring plan over a documents-shaped frame (source,
    * text). Factored so the spec can pin the prior-shrinkage and
    * evidence-floor invariants on hand-built corpora.
    */
  def topTerms(docs: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val toks = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("term"))
    val ts = toks.groupBy(col("source"), col("term")).agg(count(lit(1)).as("yi"))
    val tw = ts.groupBy(col("term")).agg(sum(col("yi")).cast("long").as("yw"))
    val ns = ts.groupBy(col("source")).agg(sum(col("yi")).cast("long").as("ni"))
    val tot = ts.agg(sum(col("yi")).cast("long").as("n"))
    // evidence floor BEFORE the vocab join: only rankable terms shuffle
    val cand = ts.filter(col("yi") >= MinCount)
      .join(tw, "term")
      .join(ns, "source")
      .crossJoin(tot)
      .select(col("source"), col("term"), col("yi"),
        (col("yw") - col("yi")).as("yj"), col("ni"),
        (col("n") - col("ni")).as("nj"),
        (lit(1000.0) * col("yw").cast("double") / col("n").cast("double"))
          .as("alpha"))
    val yiD = col("yi").cast("double")
    val yjD = col("yj").cast("double")
    val delta =
      log2((yiD + col("alpha"))
          / (col("ni").cast("double") + lit(1000.0) - yiD - col("alpha"))) -
      log2((yjD + col("alpha"))
          / (col("nj").cast("double") + lit(1000.0) - yjD - col("alpha")))
    val sd = sqrt(lit(1.0) / (yiD + col("alpha")) + lit(1.0) / (yjD + col("alpha")))
    val dq = delta.cast(graft.functions.det.D18_6)
    val z = cand.select(col("source"), col("term"),
      col("yi").as("y_src"), col("yj").as("y_rest"),
      dq.cast("double").as("delta_log2"),
      (dq.cast("double") / sd).as("zscore"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("zscore").desc, col("term"))
    z.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .select(col("source"), col("rnk"), col("term"), col("y_src"),
        col("y_rest"), col("delta_log2"), col("zscore"))
      .orderBy(col("source"), col("rnk"))
  }

  def all: Seq[Q] = Seq(q228)
}
