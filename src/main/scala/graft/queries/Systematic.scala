package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q239: SYSTEMATIC SAMPLING with exact fractional stride per source
  * (the Bresenham/largest-accumulator form of classic systematic
  * selection, survey-sampling canon, public): row r of m is selected
  * iff ⌊r·t/m⌋ > ⌊(r−1)·t/m⌋, which picks EXACTLY t = ⌈m/8⌉ rows
  * spread evenly through the doc_id order. The md5 samplers
  * (q78/q79/q113/q226) draw per-row Bernoulli/weighted — their
  * per-source counts are binomial, never exact; a shard-budget
  * planner that promised "t docs from this source" needs the
  * EXACT-COUNT sampler, and the even stride doubles as coverage over
  * any order-correlated drift (the classic systematic-over-random
  * advantage).
  *
  * Determinism: the whole query is integer arithmetic — ranks from a
  * (doc_id) total order, the selection predicate exact int64 floor
  * division (both engines' div/// truncate non-negatives
  * identically), sums exact. No floats at all.
  *
  * Scale shape: per-source rank is a partitioned window; everything
  * else folds. (A single-source corpus would want the PrefixSum rank
  * — same swap q236 documents.) Output |sources| rows carrying the
  * n_selected = t invariant.
  */
object Systematic {

  private val Den = 8 // sample ~1/8 of each source, exactly ceil(m/8)

  val q239 = Q.of(
    "q239_systematic_sample",
    s"""WITH ranked AS (
      |  SELECT source, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS r,
      |    COUNT(*) OVER (PARTITION BY source) AS m
      |  FROM documents
      |), sel AS (
      |  SELECT source, doc_id, n_chars, r, m,
      |    (m + ${Den - 1}) // $Den AS t,
      |    CASE WHEN (r * ((m + ${Den - 1}) // $Den)) // m
      |            > ((r - 1) * ((m + ${Den - 1}) // $Den)) // m
      |      THEN 1 ELSE 0 END AS pick
      |  FROM ranked
      |)
      |SELECT source,
      |  CAST(MAX(m) AS BIGINT) AS n_docs,
      |  CAST(MAX(t) AS BIGINT) AS target,
      |  CAST(SUM(pick) AS BIGINT) AS n_selected,
      |  CAST(SUM(CASE WHEN pick = 1 THEN n_chars ELSE 0 END) AS BIGINT)
      |    AS sel_chars,
      |  CAST(MIN(CASE WHEN pick = 1 THEN doc_id END) AS BIGINT)
      |    AS first_doc,
      |  CAST(MAX(CASE WHEN pick = 1 THEN doc_id END) AS BIGINT)
      |    AS last_doc
      |FROM sel GROUP BY source
      |ORDER BY source""".stripMargin) { t =>
    sample(t.documents)
  }

  /** The sampler + rollup over a (doc_id, source, n_chars) frame.
    * Factored so the spec can pin the exact-count invariant on every
    * m mod 8 residue and the even-stride spacing bound.
    */
  def sample(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val ranked = docs
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("source"))))
    val sel = ranked
      .withColumn("t", expr(s"(m + ${Den - 1}) div $Den"))
      .withColumn("pick",
        when(expr("(r * t) div m") > expr("((r - 1) * t) div m"), 1L)
          .otherwise(0L))
    sel.groupBy(col("source"))
      .agg(
        max(col("m")).cast("long").as("n_docs"),
        max(col("t")).cast("long").as("target"),
        sum(col("pick")).cast("long").as("n_selected"),
        sum(when(col("pick") === 1L, col("n_chars")).otherwise(0L))
          .cast("long").as("sel_chars"),
        min(when(col("pick") === 1L, col("doc_id"))).cast("long")
          .as("first_doc"),
        max(when(col("pick") === 1L, col("doc_id"))).cast("long")
          .as("last_doc"))
      .orderBy(col("source"))
  }

  def all: Seq[Q] = Seq(q239)
}
