package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q127: COLLOCATION extraction via pointwise mutual information —
  * the corpus-statistics pass that finds which adjacent token pairs
  * co-occur far more than chance (multi-word expressions, templated
  * phrases — the linguistics-grade upgrade of q37's raw frequent
  * tokens): PMI(a,b) = ln(B·c(a,b) / (c(a,·)·c(·,b))) over the bigram
  * event space, with all marginals taken from the SAME bigram table
  * so the distribution is self-consistent.
  *
  * Scale shape: bigrams are a per-row adjacent-pair explode inside
  * the scan stage, then ONE map-side-combined aggregate to (a, b,
  * cnt) — the only fact-sized exchange, and its output is bounded by
  * |vocab|² regardless of corpus size. Marginals ride two
  * PARTITIONED windows over that frame (never the fact); the event
  * total is a one-row broadcast (an empty-partition window would
  * collapse the vocab² frame into one task); PMI is a projection.
  * Min-support ≥ 5 keeps the report to pairs with statistical
  * footing.
  *
  * Determinism: counts are exact integers; the single `ln` is
  * computed from integer-derived doubles with the identical
  * expression on both engines and rounded to 4 decimals (the q11
  * engine-internal-arithmetic rule — libm vs DuckDB ln may differ in
  * the last ulp).
  */
object Collocation {

  private val MinSupport = 5

  /** Bigram PMI table, factored so the spec can pin a hand-computed
    * distribution (attraction > 0, repulsion < 0, independence = 0).
    */
  def pmi(docs: DataFrame, minSupport: Int): DataFrame = {
    // cached: the frame feeds both the marginal windows and the
    // one-row event total below
    val pairs = graft.CacheScope.trackedCache(docs
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1)," +
          " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
      .select(
        split(col("bg"), " ").getItem(0).as("a"),
        split(col("bg"), " ").getItem(1).as("b"),
        col("c_ab")))
    // the event total rides a one-row broadcast, NOT an
    // empty-partition window — the bigram frame is |vocab|²-bounded
    // but still grows with the corpus, and a global window would
    // collapse it into one task (exact integer sum either way)
    val tot = pairs.agg(sum(col("c_ab")).as("total"))
    pairs
      .withColumn("c_left", sum(col("c_ab")).over(Window.partitionBy(col("a"))))
      .withColumn("c_right", sum(col("c_ab")).over(Window.partitionBy(col("b"))))
      .crossJoin(broadcast(tot))
      .filter(col("c_ab") >= minSupport)
      .select(col("a"), col("b"), col("c_ab"), col("c_left"), col("c_right"),
        round(log(
          (col("total").cast("double") * col("c_ab").cast("double")) /
            (col("c_left").cast("double") * col("c_right").cast("double"))), 4)
          .as("pmi"))
  }

  val q127 = Q.of(
    "q127_collocations",
    s"""WITH w AS (
      |  SELECT string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2
      |), bg AS (
      |  SELECT unnest(list_transform(range(1, len(w)),
      |    i -> w[i] || ' ' || w[i + 1])) AS bg
      |  FROM w
      |), c AS (
      |  SELECT split_part(bg, ' ', 1) AS a, split_part(bg, ' ', 2) AS b,
      |    COUNT(*) AS c_ab
      |  FROM bg GROUP BY bg
      |), m AS (
      |  SELECT a, b, c_ab,
      |    SUM(c_ab) OVER (PARTITION BY a) AS c_left,
      |    SUM(c_ab) OVER (PARTITION BY b) AS c_right,
      |    SUM(c_ab) OVER () AS total
      |  FROM c
      |)
      |SELECT a, b, c_ab,
      |  CAST(c_left AS BIGINT) AS c_left,
      |  CAST(c_right AS BIGINT) AS c_right,
      |  round(ln((CAST(total AS DOUBLE) * CAST(c_ab AS DOUBLE))
      |    / (CAST(c_left AS DOUBLE) * CAST(c_right AS DOUBLE))), 4) AS pmi
      |FROM m
      |WHERE c_ab >= $MinSupport
      |ORDER BY a, b""".stripMargin) { t =>
    pmi(t.documents, MinSupport).orderBy(col("a"), col("b"))
  }

  def all: Seq[Q] = Seq(q127)
}
