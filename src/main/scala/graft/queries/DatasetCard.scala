package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q202: per-language DATASET CARD — the one-page corpus report every
  * released training set ships (datasheets/data-cards practice,
  * public): per lang — document and source counts, exact-duplicate
  * rate (q40's md5 identity at card grain), token volume and mean
  * length, the share passing the length gate, and the exact MEDIAN
  * length. A composed READOUT over the curation tier: q121 composes
  * the curation DECISIONS end-to-end; this composes the NUMBERS a
  * consumer of the released corpus sees first.
  *
  * The median discipline is the q109/q177 cell method, NOT a
  * per-group sorted array: n_chars has a bounded value domain, so
  * per-(lang, n_chars) cells + one cumulative window give the exact
  * LOWER MEDIAN (smallest value with cum ≥ ⌈n/2⌉ — integer-defined,
  * no interpolation, no unbounded per-group state; the array method
  * q200 uses is safe only because its window is 7 rows). Everything
  * else is integer counting; means/shares are floor(×100) over
  * token-identical double divisions (q196 cast rule).
  *
  * Scale shape: ONE documents scan → per-(lang, n_chars) cells AND
  * per-(lang, md5) duplicate groups (two map-side-combined
  * aggregates over the same scan projection — columns, not text,
  * cross the exchange: md5 is 16 bytes, n_chars an int); cumulative
  * windows run over ≤ |langs|·|domain| cells. Output: one row per
  * language.
  */
object DatasetCard {

  private val LenLo = 100L
  private val LenHi = 400L

  /** Exact lower median of `v` per `key` from bounded-domain cells.
    * Factored so the spec can pin hand-computed odd/even medians and
    * duplicate-value cells.
    */
  def lowerMedianByKey(df: DataFrame, key: Column, v: Column): DataFrame = {
    val byV = Window.partitionBy(col("key")).orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(key.as("key"), v.as("graft_v"))
      .groupBy(col("key"), col("graft_v"))
      .agg(count(lit(1)).as("graft_c"))
      .withColumn("graft_cum", sum(col("graft_c")).over(byV))
      .withColumn("graft_n",
        sum(col("graft_c")).over(Window.partitionBy(col("key"))))
      .filter(col("graft_cum") * 2 >= col("graft_n"))
      .groupBy(col("key"))
      .agg(min(col("graft_v")).as("median_v"))
  }

  val q202 = Q.of(
    "q202_dataset_card",
    s"""WITH base AS (
      |  SELECT lang, source, n_chars, md5(text) AS h,
      |    len(string_split(text, ' ')) AS toks
      |  FROM documents
      |), dup AS (
      |  SELECT lang, h, COUNT(*) AS c FROM base GROUP BY 1, 2
      |), dupr AS (
      |  SELECT lang,
      |    CAST(SUM(c) AS BIGINT) AS n_docs,
      |    CAST(COUNT(*) AS BIGINT) AS n_unique,
      |    CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_docs
      |  FROM dup GROUP BY 1
      |), vol AS (
      |  SELECT lang,
      |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      |    CAST(SUM(toks) AS BIGINT) AS total_tokens,
      |    CAST(SUM(CASE WHEN n_chars BETWEEN $LenLo AND $LenHi
      |      THEN 1 ELSE 0 END) AS BIGINT) AS len_pass
      |  FROM base GROUP BY 1
      |), cells AS (
      |  SELECT lang, n_chars, COUNT(*) AS c FROM base GROUP BY 1, 2
      |), cum AS (
      |  SELECT lang, n_chars, c,
      |    SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cumc,
      |    SUM(c) OVER (PARTITION BY lang) AS n
      |  FROM cells
      |), medx AS (
      |  SELECT lang, MIN(n_chars) AS median_chars
      |  FROM cum WHERE cumc * 2 >= n GROUP BY lang
      |)
      |SELECT d.lang AS lang, d.n_docs, d.n_unique, d.n_dup_docs,
      |  v.n_sources, v.total_tokens, v.len_pass,
      |  CAST(FLOOR(1000000.0 * CAST(d.n_dup_docs AS DOUBLE)
      |    / CAST(d.n_docs AS DOUBLE)) AS BIGINT) AS dup_ppm,
      |  CAST(FLOOR(100.0 * CAST(v.total_tokens AS DOUBLE)
      |    / CAST(d.n_docs AS DOUBLE)) AS BIGINT) AS mean_tokens_x100,
      |  CAST(FLOOR(1000000.0 * CAST(v.len_pass AS DOUBLE)
      |    / CAST(d.n_docs AS DOUBLE)) AS BIGINT) AS len_pass_ppm,
      |  m.median_chars
      |FROM dupr d
      |JOIN vol v ON v.lang = d.lang
      |JOIN medx m ON m.lang = d.lang
      |ORDER BY lang""".stripMargin) { t =>
    val base = t.documents.select(
      col("lang"), col("source"), col("n_chars"),
      md5(col("text")).as("graft_h"),
      size(split(col("text"), " ")).cast("long").as("graft_toks"))
    val dupr = base
      .groupBy(col("lang"), col("graft_h"))
      .agg(count(lit(1)).as("graft_c"))
      .groupBy(col("lang"))
      .agg(
        sum(col("graft_c")).as("n_docs"),
        count(lit(1)).as("n_unique"),
        (sum(col("graft_c")) - count(lit(1))).as("n_dup_docs"))
    val vol = base
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("source")).as("n_sources"),
        sum(col("graft_toks")).as("total_tokens"),
        sum(when(col("n_chars").between(LenLo, LenHi), 1L).otherwise(0L))
          .as("len_pass"))
    val medx = lowerMedianByKey(base, col("lang"), col("n_chars"))
      .select(col("key").as("lang"), col("median_v").as("median_chars"))
    dupr
      .join(vol, Seq("lang"))
      .join(medx, Seq("lang"))
      .select(
        col("lang"), col("n_docs"), col("n_unique"), col("n_dup_docs"),
        col("n_sources"), col("total_tokens"), col("len_pass"),
        floor(lit(1000000.0) * col("n_dup_docs").cast("double") /
          col("n_docs").cast("double")).as("dup_ppm"),
        floor(lit(100.0) * col("total_tokens").cast("double") /
          col("n_docs").cast("double")).as("mean_tokens_x100"),
        floor(lit(1000000.0) * col("len_pass").cast("double") /
          col("n_docs").cast("double")).as("len_pass_ppm"),
        col("median_chars"))
      .orderBy(col("lang"))
  }

  def all: Seq[Q] = Seq(q202)
}
