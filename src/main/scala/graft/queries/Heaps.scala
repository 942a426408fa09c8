package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q232: HEAPS' LAW vocabulary-growth fit per source — V(N) ≈ k·N^β
  * (Heaps 1978, public), the growth-curve TWIN of q207's Zipf rank
  * fit: Zipf reads the frequency spectrum at one instant, Heaps reads
  * how the vocabulary GROWS as the corpus streams in — the statistic
  * a tokenizer-budget or dedup planner wants ("how much new
  * vocabulary does the next shard buy"), and a low β flags a
  * template/boilerplate source before any dedup pass runs.
  *
  * The curve: docs stream in doc_id order; checkpoint d has
  * N_d = cumulative tokens and V_d = cumulative DISTINCT terms. V_d
  * never re-scans prefixes: each term contributes 1 at its FIRST
  * doc (min doc_id per (source, term) — one fold over the token
  * frame), new-term counts land on the doc spine, and BOTH running
  * sums are per-source prefix windows over the doc grain. β and
  * log2 k come from OLS on (log2 N_d, log2 V_d).
  *
  * Determinism (the q224 recipe on a log2 surface): N_d/V_d are
  * exact integers; log2 values are quantized to D18_6 per checkpoint
  * (the q129 rule for transcendentals); the OLS moments are exact
  * decimal sums of exact decimal PRODUCTS (D18_6 × D18_6 → scale-12
  * decimals, order-independent), and the oracle bounces each moment
  * through VARCHAR (§6(k): at sf1 the Σxx scaled integers exceed
  * 2⁵³); the final β/intercept chain is fixed IEEE over identical
  * doubles.
  *
  * Scale shape: one token explode → (source, term) fold (map-side
  * combined, vocab-bounded) → first-doc fold; per-source windows
  * ride the doc grain (docs per source, not tokens); the OLS fold is
  * |sources| rows. Nothing quadratic, no global window.
  */
object Heaps {

  val q232 = Q.of(
    "q232_heaps_law",
    """WITH toks AS (
      |  SELECT source, doc_id,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents WHERE length(trim(text)) > 0
      |), doc_tok AS (
      |  SELECT source, doc_id, COUNT(*) AS n_tok FROM toks GROUP BY 1, 2
      |), first_occ AS (
      |  SELECT source, term, MIN(doc_id) AS first_doc
      |  FROM toks GROUP BY 1, 2
      |), new_terms AS (
      |  SELECT source, first_doc AS doc_id, COUNT(*) AS n_new
      |  FROM first_occ GROUP BY 1, 2
      |), ck AS (
      |  SELECT d.source, d.doc_id,
      |    SUM(d.n_tok) OVER (PARTITION BY d.source ORDER BY d.doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nd,
      |    SUM(COALESCE(nt.n_new, 0)) OVER (PARTITION BY d.source
      |      ORDER BY d.doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vd
      |  FROM doc_tok d LEFT JOIN new_terms nt
      |    ON nt.source = d.source AND nt.doc_id = d.doc_id
      |), pts AS (
      |  SELECT source,
      |    CAST(log2(CAST(nd AS DOUBLE)) AS DECIMAL(18,6)) AS x,
      |    CAST(log2(CAST(vd AS DOUBLE)) AS DECIMAL(18,6)) AS y
      |  FROM ck
      |), m AS (
      |  SELECT source, COUNT(*) AS n,
      |    CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM pts GROUP BY source
      |), tot AS (
      |  SELECT source,
      |    CAST(MAX(nd) AS BIGINT) AS total_tokens,
      |    CAST(MAX(vd) AS BIGINT) AS vocab
      |  FROM ck GROUP BY source
      |)
      |SELECT m.source, m.n AS n_checkpoints,
      |  tot.total_tokens, tot.vocab,
      |  (CAST(m.n AS DOUBLE) * m.sxy - m.sx * m.sy)
      |    / (CAST(m.n AS DOUBLE) * m.sxx - m.sx * m.sx) AS heaps_beta,
      |  (m.sy - (CAST(m.n AS DOUBLE) * m.sxy - m.sx * m.sy)
      |    / (CAST(m.n AS DOUBLE) * m.sxx - m.sx * m.sx) * m.sx)
      |    / CAST(m.n AS DOUBLE) AS heaps_log2k
      |FROM m JOIN tot ON tot.source = m.source
      |ORDER BY m.source""".stripMargin) { t =>
    fit(t.documents)
  }

  /** The full Heaps fit over a documents-shaped frame (source, doc_id,
    * text). Factored so the spec can pin the closed-form corpora
    * (one-new-term-per-doc → β = 1; constant template → β = 0).
    */
  def fit(docs: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val toks = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("source"), col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("term"))
    val docTok = toks.groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_tok"))
    val newTerms = toks.groupBy(col("source"), col("term"))
      .agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_new"))
    val prefix = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ck = docTok
      .join(newTerms, Seq("source", "doc_id"), "left")
      .select(col("source"), col("doc_id"), col("n_tok"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .select(col("source"),
        sum(col("n_tok")).over(prefix).as("nd"),
        sum(col("n_new")).over(prefix).as("vd"))
    val pts = ck.select(col("source"),
      log2(col("nd").cast("double")).cast(det.D18_6).as("x"),
      log2(col("vd").cast("double")).cast(det.D18_6).as("y"))
    val m = pts.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("x") * col("y")).cast("double").as("sxy"))
    val tot = ck.groupBy(col("source")).agg(
      max(col("nd")).cast("long").as("total_tokens"),
      max(col("vd")).cast("long").as("vocab"))
    val nd = col("n").cast("double")
    val beta = (nd * col("sxy") - col("sx") * col("sy")) /
      (nd * col("sxx") - col("sx") * col("sx"))
    m.join(tot, Seq("source"))
      .select(col("source"), col("n").as("n_checkpoints"),
        col("total_tokens"), col("vocab"),
        beta.as("heaps_beta"),
        ((col("sy") - beta * col("sx")) / nd).as("heaps_log2k"))
      .orderBy(col("source"))
  }

  def all: Seq[Q] = Seq(q232)
}
