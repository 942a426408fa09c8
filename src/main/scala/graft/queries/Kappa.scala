package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.TextProfile

/** q235: COHEN'S KAPPA chance-corrected agreement between the q32
  * language classifier and the declared labels (Cohen 1960, public) —
  * the AGREEMENT member of the scorer-eval tier: q218's confusion
  * matrix and macro-F1 grade per-class retrieval quality, but on a
  * skewed label mix raw accuracy flatters a majority-class guesser;
  * κ subtracts exactly the agreement the marginals would produce by
  * chance (κ = (p_o − p_e)/(1 − p_e)) — the number a labeling-
  * pipeline audit quotes before trusting weak labels.
  *
  * Exactness by cleared denominators (the q217 rule): with N rows,
  * diag = Σ agreements, and E = Σ_label row_marginal·col_marginal,
  * κ = (N·diag − E)/(N² − E) — every term an exact int64 product, ONE
  * IEEE division; p_o and p_e are one exact division each. No
  * decimals, no rounding, no transcendentals. Labels outside the
  * classifier's range (zh) stay in the matrix as chance-weighted
  * disagreements — stated, not dropped (their predicted marginal is
  * 0, so they depress p_o without inventing p_e mass).
  *
  * Scale shape: ONE documents scan → ≤|langs|² cells (q198's
  * marginals-from-the-joint rule — both marginals fold from the same
  * cell frame) → a one-row readout.
  */
object Kappa {

  val q235 = Q.of(
    "q235_cohens_kappa",
    """WITH scored AS (
      |  SELECT lang AS declared,
      |    CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
      |         WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
      |         WHEN es_hits >= fr_hits THEN 'es'
      |         ELSE 'fr' END AS predicted
      |  FROM (
      |    SELECT lang,
      |      len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is)\b')) AS en_hits,
      |      len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|ein)\b')) AS de_hits,
      |      len(regexp_extract_all(text, '\b(el|los|las|una|es|y|que)\b')) AS es_hits,
      |      len(regexp_extract_all(text, '\b(le|les|des|et|est|une|dans)\b')) AS fr_hits
      |    FROM documents
      |  )
      |), cells AS (
      |  SELECT declared AS d, predicted AS p, COUNT(*) AS c
      |  FROM scored GROUP BY 1, 2
      |), marg AS (
      |  SELECT COALESCE(dm.lab, pm.lab) AS lab,
      |    COALESCE(dm.rm, 0) AS rm, COALESCE(pm.cm, 0) AS cm
      |  FROM (SELECT d AS lab, CAST(SUM(c) AS BIGINT) AS rm FROM cells GROUP BY 1) dm
      |  FULL OUTER JOIN
      |    (SELECT p AS lab, CAST(SUM(c) AS BIGINT) AS cm FROM cells GROUP BY 1) pm
      |    ON pm.lab = dm.lab
      |), tot AS (
      |  SELECT
      |    (SELECT CAST(SUM(c) AS BIGINT) FROM cells) AS n,
      |    (SELECT CAST(COALESCE(SUM(CASE WHEN d = p THEN c END), 0) AS BIGINT)
      |       FROM cells) AS diag,
      |    (SELECT CAST(SUM(rm * cm) AS BIGINT) FROM marg) AS e
      |)
      |SELECT n, diag AS n_agree,
      |  CAST(diag AS DOUBLE) / CAST(n AS DOUBLE) AS p_observed,
      |  CAST(e AS DOUBLE) / CAST(n * n AS DOUBLE) AS p_chance,
      |  CASE WHEN n * n - e = 0 THEN NULL
      |    ELSE CAST(n * diag - e AS DOUBLE) / CAST(n * n - e AS DOUBLE)
      |    END AS kappa
      |FROM tot""".stripMargin) { t =>
    val p = TextProfile(col("text"))
    val scored = t.documents.select(col("lang").as("declared"),
      p.getField("en_hits").as("en_hits"),
      p.getField("de_hits").as("de_hits"),
      p.getField("es_hits").as("es_hits"),
      p.getField("fr_hits").as("fr_hits"))
      .withColumn("predicted",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits") &&
          col("en_hits") >= col("fr_hits"), "en")
          .when(col("de_hits") >= col("es_hits") && col("de_hits") >= col("fr_hits"), "de")
          .when(col("es_hits") >= col("fr_hits"), "es")
          .otherwise("fr"))
    kappaOf(scored, col("declared"), col("predicted"))
  }

  /** One-row κ readout over a two-labeler frame. Factored so the spec
    * can pin perfect agreement (κ = 1), independent marginals (κ = 0
    * in expectation form), and the rectangular zh case by hand.
    */
  def kappaOf(df: DataFrame, rater1: Column, rater2: Column): DataFrame = {
    val cells = df.groupBy(rater1.as("d"), rater2.as("p"))
      .agg(count(lit(1)).as("c"))
    val dm = cells.groupBy(col("d").as("lab"))
      .agg(sum(col("c")).cast("long").as("rm"))
    val pm = cells.groupBy(col("p").as("lab"))
      .agg(sum(col("c")).cast("long").as("cm"))
    val marg = dm.join(pm.withColumnRenamed("lab", "lab2"),
        col("lab") === col("lab2"), "full_outer")
      .select(
        coalesce(col("rm"), lit(0L)).as("rm"),
        coalesce(col("cm"), lit(0L)).as("cm"))
    val e = marg.agg(sum(col("rm") * col("cm")).cast("long").as("e"))
    val nd = cells.agg(
      sum(col("c")).cast("long").as("n"),
      coalesce(sum(when(col("d") === col("p"), col("c"))), lit(0L))
        .cast("long").as("diag"))
    // degenerate guard: all mass in ONE cell gives n² = E, so κ is
    // 0/0 — Spark NaN vs DuckDB NULL; both sides guard to NULL
    val kden = col("n") * col("n") - col("e")
    nd.crossJoin(broadcast(e))
      .select(col("n"), col("diag").as("n_agree"),
        (col("diag").cast("double") / col("n").cast("double"))
          .as("p_observed"),
        (col("e").cast("double") / (col("n") * col("n")).cast("double"))
          .as("p_chance"),
        when(kden =!= 0,
          (col("n") * col("diag") - col("e")).cast("double")
            / kden.cast("double")).as("kappa"))
  }

  def all: Seq[Q] = Seq(q235)
}
