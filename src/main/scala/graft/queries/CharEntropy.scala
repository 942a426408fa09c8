package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q227: CHARACTER-ENTROPY quality gate per language — bits-per-char
  * H = log2(n) − (Σ c·log2 c)/n over each document's character
  * frequencies (Shannon, public): the closed-form twin of q132's
  * deflate compression-ratio gate (near-zero H = repeated junk, high
  * H = random noise, prose between) — and unlike the deflate loop,
  * fully SQL-replayable, so THIS member of the compressibility family
  * carries an exact oracle. Banded per the q132 ladder and rolled up
  * per language with banded counts + the exact-decimal mean.
  *
  * Determinism (the q129 lesson applied): c·log2(c) terms are
  * quantized to D18_6 at the (doc, char) grain BEFORE the per-doc sum
  * (order-independent exact decimal addition; log2 is the proven
  * engine-matched transcendental), the per-doc H is one fixed IEEE
  * chain over the exact sum, and the per-language mean quantizes each
  * doc's H once more before the exact rollup — no order-dependent
  * double summation anywhere.
  *
  * Scale shape: one documents scan explodes to (doc, char) cells
  * (≤ alphabet per doc after the count fold — map-side combined),
  * one doc-grain fold, one |langs|-grain rollup. Nothing shuffles
  * text.
  */
object CharEntropy {

  val q227 = Q.of(
    "q227_char_entropy",
    """WITH cells AS (
      |  SELECT doc_id, lang, c, COUNT(*) AS k FROM (
      |    SELECT doc_id, lang, unnest(string_split(text, '')) AS c
      |    FROM documents WHERE length(text) > 0
      |  ) GROUP BY 1, 2, 3
      |), perdoc AS (
      |  SELECT doc_id, lang,
      |    CAST(SUM(k) AS BIGINT) AS n,
      |    SUM(CAST(CAST(k AS DOUBLE) * log2(CAST(k AS DOUBLE))
      |        AS DECIMAL(18,6))) AS s
      |  FROM cells GROUP BY 1, 2
      |), h AS (
      |  SELECT doc_id, lang,
      |    CAST(log2(CAST(n AS DOUBLE))
      |      - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(18,6)) AS bpc
      |  FROM perdoc
      |)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(bpc) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_bpc,
      |  CAST(SUM(CASE WHEN bpc < 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  CAST(SUM(CASE WHEN bpc >= 3.0 AND bpc < 4.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_prose,
      |  CAST(SUM(CASE WHEN bpc >= 4.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM h GROUP BY lang
      |ORDER BY lang""".stripMargin) { t =>
    val cells = t.documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), "")).as("c"))
      .groupBy(col("doc_id"), col("lang"), col("c"))
      .agg(count(lit(1)).as("k"))
    val perdoc = cells
      .groupBy(col("doc_id"), col("lang"))
      .agg(
        sum(col("k")).cast("long").as("n"),
        sum((col("k").cast("double") * log2(col("k").cast("double")))
          .cast(det.D18_6)).as("s"))
    val h = perdoc.select(col("lang"),
      (log2(col("n").cast("double"))
        - col("s").cast("double") / col("n").cast("double"))
        .cast(det.D18_6).as("bpc"))
    h.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("bpc")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_bpc"),
        sum(when(col("bpc") < 3.0, 1L).otherwise(0L)).cast("long").as("n_low"),
        sum(when(col("bpc") >= 3.0 && col("bpc") < 4.5, 1L).otherwise(0L))
          .cast("long").as("n_prose"),
        sum(when(col("bpc") >= 4.5, 1L).otherwise(0L)).cast("long").as("n_high"))
      .orderBy(col("lang"))
  }

  def all: Seq[Q] = Seq(q227)
}
