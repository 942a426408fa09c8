package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q184: TEMPERATURE-SCALED DATA-MIXTURE planner — per corpus domain
  * (lang × source), the τ = 2 sampling plan: raw token share p_d,
  * tempered share p_d^(1/τ) / Σ p^(1/τ), and the resulting
  * sampling boost — the standard multilingual-pretraining reweighting
  * (the exponentiated-share sampler of mBERT/XLM-R lineage, public)
  * that upsamples tail domains and downsamples the head so the model
  * sees a flatter mixture than the raw corpus. The planner half of
  * what q113 executes: q113 samples AT given per-source rates (and
  * q160 apportions exact counts); this COMPUTES the rates from the
  * corpus itself.
  *
  * Determinism (§6): token counts are exact int64; p_raw is ONE IEEE
  * division; τ = 2 means the tempering is `sqrt` — the one
  * transcendental-looking op that IEEE-754 requires to be CORRECTLY
  * ROUNDED, hence bit-identical across engines (ln/exp are not,
  * which is why τ is fixed at 2 rather than a free exponent); the
  * normalizer Σ√p is a D20_6-quantized decimal sum over the bounded
  * domain frame (order-independent), and every downstream column is
  * a division/multiplication of already-pinned doubles.
  *
  * Scale shape: ONE map-side-combined (lang, source) aggregate —
  * constant state per domain, the only fact-sized pass; the total
  * and normalizer ride a one-row broadcast back onto the
  * domain-bounded frame; everything after is a projection over
  * dozens of rows.
  */
object Mixture {

  /** τ=2 mixture plan over per-domain masses. Factored so the spec
    * can pin a hand-computed two-domain plan (9:1 → 3:1), the
    * uniform fixed point (tempering a flat mixture is a no-op), and
    * boost monotonicity (tail boosted ≥ head).
    */
  def plan(masses: DataFrame, domainCols: Seq[String], massCol: String): DataFrame = {
    val dcols = domainCols.map(col)
    val cells = masses.groupBy(dcols: _*)
      .agg(sum(col(massCol)).as("graft_m"))
    val totals = cells.agg(
      sum(col("graft_m")).as("graft_t"),
      sum(sqrt(col("graft_m").cast("double")).cast(det.D20_6))
        .as("graft_z")).select(
      col("graft_t"),
      col("graft_z").cast("double").as("graft_z"))
    // √p_d / Σ√p over a COMMON √total factors out: tempered share =
    // √m_d / Σ√m — so the normalizer sums √mass, never √(m/T), and
    // one division per domain remains
    cells.crossJoin(broadcast(totals))
      .select(
        (dcols :+
          col("graft_m").as("n_tokens") :+
          (col("graft_m").cast("double") / col("graft_t").cast("double"))
            .as("p_raw") :+
          (sqrt(col("graft_m").cast("double")) / col("graft_z"))
            .as("p_tempered") :+
          ((sqrt(col("graft_m").cast("double")) / col("graft_z")) /
            (col("graft_m").cast("double") / col("graft_t").cast("double")))
            .as("boost")): _*)
  }

  val q184 = Q.of(
    "q184_mixture_plan",
    """WITH cells AS (
      |  SELECT lang, source,
      |    SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS m
      |  FROM documents GROUP BY 1, 2
      |), tot AS (
      |  SELECT SUM(m) AS t,
      |    CAST(SUM(CAST(sqrt(CAST(m AS DOUBLE)) AS DECIMAL(20,6))) AS DOUBLE) AS z
      |  FROM cells
      |)
      |SELECT lang, source,
      |  CAST(m AS BIGINT) AS n_tokens,
      |  CAST(m AS DOUBLE) / CAST(t AS DOUBLE) AS p_raw,
      |  sqrt(CAST(m AS DOUBLE)) / z AS p_tempered,
      |  (sqrt(CAST(m AS DOUBLE)) / z) / (CAST(m AS DOUBLE) / CAST(t AS DOUBLE)) AS boost
      |FROM cells CROSS JOIN tot
      |ORDER BY lang, source""".stripMargin) { t =>
    plan(
      t.documents.select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("graft_mass")),
      Seq("lang", "source"), "graft_mass")
      .orderBy(col("lang"), col("source"))
  }

  def all: Seq[Q] = Seq(q184)
}
