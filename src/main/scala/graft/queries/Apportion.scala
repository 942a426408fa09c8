package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q160: LARGEST-REMAINDER APPORTIONMENT (Hamilton's method, public)
  * — split a FIXED budget of 10 000 sample slots across sources
  * proportionally to their CHARACTER mass so the total lands EXACTLY
  * on budget: floor every quota, then hand the leftover slots to the
  * largest fractional remainders. This is the exact-quota sampling
  * planner the q113 mixture sampler needs upstream (md5-threshold
  * sampling hits a RATE, not a count; shard budgets, eval-set sizing,
  * and per-source caps all need counts that sum exactly).
  *
  * Determinism: quotas are computed in INTEGER arithmetic — share =
  * c·B div T, remainder rank on (c·B mod T) — so there is no float
  * anywhere near the rank boundary (the floor(c·B/T) spelling in
  * doubles ties at representability edges); remainder ties break by
  * source name (q124 lesson). Σ alloc ≡ B by construction — pinned.
  *
  * Scale shape: one map-side-combined source rollup (output bounded
  * by the source alphabet); the rank windows ride the bounded frame.
  */
object Apportion {

  /** Hamilton allocation of `budget` over per-key counts. Factored so
    * the spec can pin the textbook paradox-free cases: exact
    * proportions, remainder ordering, and the sum-equals-budget
    * invariant.
    */
  def hamilton(counts: DataFrame, keyCol: String, nCol: String,
      budget: Long): DataFrame = {
    val whole = Window.partitionBy()
    val byRemainder = Window.orderBy(
      (col(nCol) * budget % col("graft_t")).desc, col(keyCol))
    counts
      .withColumn("graft_t", sum(col(nCol)).over(whole))
      // `div`, not `/`: Spark's `/` on bigints is DOUBLE division, and
      // a quotient landing within 1 ulp above an integer would round up
      // across the floor boundary — integer division has no such edge
      .withColumn("graft_floor",
        expr(s"$nCol * ${budget}L div graft_t"))
      .withColumn("graft_rem", col(nCol) * budget % col("graft_t"))
      .withColumn("graft_leftover", lit(budget) - sum(col("graft_floor")).over(whole))
      .withColumn("graft_rank", row_number().over(byRemainder))
      .select(
        col(keyCol),
        col(nCol).as("n_chars"),
        col("graft_floor").as("floor_share"),
        (col("graft_floor") +
          when(col("graft_rank") <= col("graft_leftover"), 1L).otherwise(0L))
          .as("alloc"))
  }

  val q160 = Q.of(
    "q160_apportion_budget",
    """WITH counts AS (
      |  SELECT source, SUM(n_chars) AS n FROM documents GROUP BY 1
      |), quotas AS (
      |  SELECT source, n,
      |    SUM(n) OVER () AS t,
      |    (n * 10000) // SUM(n) OVER () AS f,
      |    (n * 10000) % SUM(n) OVER () AS rem
      |  FROM counts
      |), ranked AS (
      |  SELECT source, n, f,
      |    10000 - SUM(f) OVER () AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, source) AS rk
      |  FROM quotas
      |)
      |SELECT source,
      |  CAST(n AS BIGINT) AS n_chars,
      |  CAST(f AS BIGINT) AS floor_share,
      |  CAST(f + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
      |FROM ranked
      |ORDER BY source""".stripMargin) { t =>
    hamilton(
      t.documents.groupBy(col("source")).agg(sum(col("n_chars")).as("n")),
      "source", "n", 10000L)
      .orderBy(col("source"))
  }

  def all: Seq[Q] = Seq(q160)
}
