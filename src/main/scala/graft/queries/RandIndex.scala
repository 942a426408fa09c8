package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q273: BLOCKING-AGREEMENT audit via the ADJUSTED RAND INDEX
  * (Hubert–Arabie 1985, public) — do two independent dedup blocking
  * schemes partition the corpus the same way? Clustering A keys docs
  * by their first-4-token prefix, clustering B by their last-4-token
  * suffix (the two star grains q259 merges; NEITHER refines the
  * other, which is what makes the comparison informative — two
  * text-derived keys where one is a function of the other would pin
  * ARI trivially). The readout is the standard pair-counting one:
  * Rand index (share of doc pairs the two schemes agree on) and its
  * chance-corrected ARI.
  *
  * ALL-INTEGER pair counting: the corpus collapses to the (ka, kb)
  * CONTINGENCY frame in one map-side-combined rollup, and every
  * quantity derives from it — X = Σ C(n_ij,2), A = Σ C(a_i,2) with
  * a_i the ka row-sums, B likewise for kb, T = C(n,2); C(x,2) =
  * x·(x−1) div 2 is exact (even product). rand_pm = (T−A−B+2X)·1000
  * div T has non-negative operands; ARI = 2(XT−AB) / (T(A+B)−2AB)
  * can be negative, so it ships as abs per-mille + a ±1 sign (the
  * q272 discipline — `div` on non-negative operands ≡ DuckDB `//`).
  * Overflow headroom: X·T ≤ pair-mass × C(n,2) stays inside int64 to
  * ~10⁹ docs; past that the products route through decimal(38) on
  * both engines unchanged.
  *
  * Scale shape: ONE corpus projection → the contingency rollup;
  * row/column sums and the four scalars are contingency-sized
  * aggregates (key-vocabulary rows, never corpus rows); output is a
  * single row. Degenerate guard: with n < 2 the denominators are 0 —
  * the corpus always has pairs, and the spec pins the guard shapes.
  */
object RandIndex {

  val q273 = Q.of(
    "q273_blocking_ari",
    """WITH keyed AS (
      |  SELECT
      |    md5(array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1, 4), ' ')) AS ka,
      |    md5(array_to_string(list_slice(list_reverse(string_split_regex(trim(text), '\s+')), 1, 4), ' ')) AS kb
      |  FROM documents
      |), cont AS (
      |  SELECT ka, kb, CAST(COUNT(*) AS BIGINT) AS n FROM keyed GROUP BY 1, 2
      |), x AS (
      |  SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS x,
      |    CAST(SUM(n) AS BIGINT) AS n_docs
      |  FROM cont
      |), ra AS (
      |  SELECT CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS a
      |  FROM (SELECT SUM(n) AS s FROM cont GROUP BY ka)
      |), rb AS (
      |  SELECT CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS b
      |  FROM (SELECT SUM(n) AS s FROM cont GROUP BY kb)
      |), sc AS (
      |  SELECT n_docs, x, a, b, n_docs * (n_docs - 1) // 2 AS t
      |  FROM x, ra, rb
      |)
      |SELECT n_docs, x AS pairs_both, a AS pairs_a, b AS pairs_b, t AS pairs_total,
      |  (t - a - b + 2 * x) * 1000 // t AS rand_pm,
      |  CASE WHEN t * (a + b) - 2 * a * b = 0 THEN 1000
      |    ELSE abs(2 * (x * t - a * b)) * 1000 // (t * (a + b) - 2 * a * b)
      |  END AS ari_abs_pm,
      |  CAST(CASE WHEN x * t >= a * b THEN 1 ELSE -1 END AS BIGINT) AS ari_sign
      |FROM sc""".stripMargin) { t =>
    report(t.documents)
  }

  /** The q273 body over a (text) frame. Factored so the spec can pin
    * identical partitions (ARI = 1000), independent-looking crossed
    * partitions, and the pair-count arithmetic by hand.
    */
  def report(docs: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val keyed = docs.select(
      md5(concat_ws(" ", slice(toks, 1, 4))).as("ka"),
      md5(concat_ws(" ", slice(reverse(toks), 1, 4))).as("kb"))
    fromKeys(keyed)
  }

  /** ARI over an explicit (ka, kb) two-key frame (spec entry point). */
  def fromKeys(keyed: DataFrame): DataFrame = {
    val cont = keyed.groupBy(col("ka"), col("kb"))
      .agg(count(lit(1)).as("n"))
    val x = cont.agg(
      sum(expr("n * (n - 1) div 2")).as("x"),
      sum(col("n")).as("n_docs"))
    val ra = cont.groupBy(col("ka")).agg(sum(col("n")).as("s"))
      .agg(sum(expr("s * (s - 1) div 2")).as("a"))
    val rb = cont.groupBy(col("kb")).agg(sum(col("n")).as("s"))
      .agg(sum(expr("s * (s - 1) div 2")).as("b"))
    x.crossJoin(broadcast(ra)).crossJoin(broadcast(rb))
      .withColumn("t", expr("n_docs * (n_docs - 1) div 2"))
      .select(col("n_docs"), col("x").as("pairs_both"), col("a").as("pairs_a"),
        col("b").as("pairs_b"), col("t").as("pairs_total"),
        expr("(t - a - b + 2 * x) * 1000 div t").as("rand_pm"),
        // both-all-singleton partitions (denominator 0) agree on every
        // pair — ARI pinned to 1 by convention
        when(expr("t * (a + b) - 2 * a * b") === 0, 1000L)
          .otherwise(
            expr("abs(2 * (x * t - a * b)) * 1000 div (t * (a + b) - 2 * a * b)"))
          .as("ari_abs_pm"),
        when(col("x") * col("t") >= col("a") * col("b"), 1L).otherwise(-1L)
          .as("ari_sign"))
  }

  def all: Seq[Q] = Seq(q273)
}
