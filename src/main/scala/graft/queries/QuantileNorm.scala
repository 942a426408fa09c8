package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.PrefixSum

/** q236: QUANTILE NORMALIZATION of per-source length distributions
  * onto the pooled corpus distribution (Bolstad et al. 2003 — the
  * microarray-era standard, public; in LLM curation the same move
  * aligns per-source feature scales before mixing/thresholding so a
  * single quality cut doesn't over-prune sources with shifted
  * distributions). Each doc's n_chars is replaced by the pooled value
  * at the same quantile: per-source rank r of m maps to pooled
  * position p = ⌊(2r−1)·n / (2m)⌋ + 1 (the nearest-rank midpoint
  * rule in EXACT integer arithmetic — p ∈ [1, n] by construction,
  * and a single-source corpus maps to the identity).
  *
  * Determinism: ranks are total orders on (n_chars, doc_id); the
  * position map is pure int64; normalized values are exact integers
  * from the pooled frame; means are single IEEE divisions of exact
  * integer sums. No decimals, no transcendentals.
  *
  * Scale shape: the per-source rank is a partitioned window (fine);
  * the POOLED rank is the q80/q221 hazard — a global ROW_NUMBER
  * would collapse to one WindowExec task — so it rides
  * [[PrefixSum.orderedRunningSum]] (range-partition + driver offsets,
  * full parallelism, driver state = one long per partition). The
  * mapping join is an equi-join on the pooled position, volume n.
  */
object QuantileNorm {

  val q236 = Q.of(
    "q236_quantile_norm",
    """WITH ranked AS (
      |  SELECT doc_id, source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
      |    COUNT(*) OVER (PARTITION BY source) AS m
      |  FROM documents
      |), pooled AS (
      |  SELECT n_chars AS norm_chars,
      |    ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS p
      |  FROM documents
      |), mapped AS (
      |  SELECT ranked.source, ranked.n_chars,
      |    pooled.norm_chars
      |  FROM ranked JOIN pooled
      |    ON pooled.p = (2 * ranked.r - 1) * (SELECT COUNT(*) FROM documents)
      |                  // (2 * ranked.m) + 1
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_raw,
      |  CAST(SUM(norm_chars) AS BIGINT) AS sum_norm,
      |  CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_raw,
      |  CAST(SUM(norm_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_norm,
      |  CAST(MIN(norm_chars) AS BIGINT) AS min_norm,
      |  CAST(MAX(norm_chars) AS BIGINT) AS max_norm
      |FROM mapped GROUP BY source
      |ORDER BY source""".stripMargin) { t =>
    normalize(t.documents)
  }

  /** The normalization plan over a (doc_id, source, n_chars) frame.
    * Factored so the spec can pin the identity on a single source,
    * the midpoint map on hand distributions, and mean preservation.
    */
  def normalize(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val perSrc = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    val ranked = base
      .withColumn("r", row_number().over(perSrc).cast("long"))
      .withColumn("m",
        count(lit(1)).over(Window.partitionBy(col("source"))))
    val pooled = PrefixSum.orderedRunningSum(
      base.select(col("doc_id"), col("n_chars")),
      orderBy = Seq(col("n_chars"), col("doc_id")),
      value = lit(1L), outCol = "p", numPartitions = 8)
      .select(col("n_chars").as("norm_chars"), col("p"))
    val nTot = base.agg(count(lit(1)).as("n"))
    val mapped = ranked.crossJoin(broadcast(nTot))
      .withColumn("p",
        expr("(2 * r - 1) * n div (2 * m) + 1"))
      .join(pooled, Seq("p"))
    mapped.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_raw"),
        sum(col("norm_chars")).cast("long").as("sum_norm"),
        (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_raw"),
        (sum(col("norm_chars")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_norm"),
        min(col("norm_chars")).cast("long").as("min_norm"),
        max(col("norm_chars")).cast("long").as("max_norm"))
      .orderBy(col("source"))
  }

  def all: Seq[Q] = Seq(q236)
}
