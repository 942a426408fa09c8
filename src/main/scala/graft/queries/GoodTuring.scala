package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q234: GOOD–TURING unseen-mass estimate per source (Good 1953,
  * public; the Gale–Sampson presentation) — the frequency-of-
  * frequencies readout of the LM tier: N₁/N estimates the probability
  * that the NEXT token is a type never seen in this source (the OOV
  * mass a tokenizer or LM smoother must reserve), and r* = (r+1)·
  * N_{r+1}/N_r gives the smoothed counts the raw MLE over-estimates.
  * Beside q232 (Heaps: how vocabulary grows with MORE data) this
  * prices what is ALREADY missing at the current size; the two
  * together are the corpus-planning pair. The spectrum head
  * N₁..N₅ is emitted raw — its shape (vs the Zipf-predicted
  * N_r ∝ 1/r(r+1)) is the q207 cross-check.
  *
  * Determinism: the whole query is exact integer arithmetic — type
  * counts, the N_r spectrum, token totals — with exactly two IEEE
  * divisions at the end (p₀ = N₁/N and r₁* = 2·N₂/N₁, guarded NULL
  * when N₁ = 0). No decimals, no transcendentals.
  *
  * Scale shape: one token explode → (source, term) fold (map-side
  * combined, vocab-bounded) → (source, r) spectrum fold → |sources|
  * rows via conditional sums. The heavy frame is the vocab, never
  * the corpus.
  */
object GoodTuring {

  val q234 = Q.of(
    "q234_good_turing",
    """WITH toks AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents WHERE length(trim(text)) > 0
      |), tc AS (
      |  SELECT source, term, COUNT(*) AS r FROM toks GROUP BY 1, 2
      |), spec AS (
      |  SELECT source, r, COUNT(*) AS nr FROM tc GROUP BY 1, 2
      |), agg AS (
      |  SELECT source,
      |    CAST(SUM(r * nr) AS BIGINT) AS n_tokens,
      |    CAST(SUM(nr) AS BIGINT) AS n_types,
      |    CAST(SUM(CASE WHEN r = 1 THEN nr ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN r = 2 THEN nr ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN r = 3 THEN nr ELSE 0 END) AS BIGINT) AS n3,
      |    CAST(SUM(CASE WHEN r = 4 THEN nr ELSE 0 END) AS BIGINT) AS n4,
      |    CAST(SUM(CASE WHEN r = 5 THEN nr ELSE 0 END) AS BIGINT) AS n5
      |  FROM spec GROUP BY source
      |)
      |SELECT source, n_tokens, n_types, n1, n2, n3, n4, n5,
      |  CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS p_unseen,
      |  CASE WHEN n1 > 0
      |    THEN 2.0 * CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS r1_smoothed
      |FROM agg
      |ORDER BY source""".stripMargin) { t =>
    spectrum(t.documents)
  }

  /** The spectrum plan over a (source, text) frame. Factored so the
    * spec can pin the hand-counted spectrum and the p₀/r* arithmetic.
    */
  def spectrum(docs: DataFrame): DataFrame = {
    val tc = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("r"))
    val spec = tc.groupBy(col("source"), col("r")).agg(count(lit(1)).as("nr"))
    def nAt(k: Int) =
      sum(when(col("r") === k, col("nr")).otherwise(0L)).cast("long").as(s"n$k")
    val agg = spec.groupBy(col("source")).agg(
      sum(col("r") * col("nr")).cast("long").as("n_tokens"),
      sum(col("nr")).cast("long").as("n_types"),
      nAt(1), nAt(2), nAt(3), nAt(4), nAt(5))
    agg.select(col("source"), col("n_tokens"), col("n_types"),
        col("n1"), col("n2"), col("n3"), col("n4"), col("n5"),
        (col("n1").cast("double") / col("n_tokens").cast("double"))
          .as("p_unseen"),
        when(col("n1") > 0,
          lit(2.0) * col("n2").cast("double") / col("n1").cast("double"))
          .as("r1_smoothed"))
      .orderBy(col("source"))
  }

  def all: Seq[Q] = Seq(q234)
}
