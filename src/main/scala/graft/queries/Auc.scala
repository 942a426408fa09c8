package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q190: exact tie-corrected ROC-AUC per segment — the standard
  * scorecard for any binary scorer the pipeline trains (the q117
  * hashed-bigram classifier, the q95 LM-quality gate, the q84 Gopher
  * filters all emit a score whose usefulness IS its AUC). AUC is the
  * probability a random positive outranks a random negative, which by
  * the rank-sum identity is (R₊ − n₊(n₊+1)/2)/(n₊·n₋) with ties at
  * half credit (Hanley & McNeil 1982; equivalently the Mann–Whitney
  * U normalizer — q172's statistic re-read as classifier quality).
  *
  * Determinism — the q172 integer-rank discipline: per (segment,
  * score) tie-block counts, cumulative block base cb from one
  * range-ordered window, TWICE the positive rank sum
  * 2R₊ = Σ c₊·(2·cb+ct+1) an exact int64, so
  * auc = (2R₊ − n₊(n₊+1)) / (2·n₊·n₋) is ONE IEEE division of exact
  * integers — written token-identically in the oracle, no rounding
  * anywhere. One-class segments guard to NULL on both sides.
  *
  * Scale shape: per-(segment, score) aggregate (map-side combined —
  * only distinct score cells cross the exchange, not rows), one
  * window partitioned by segment, one per-segment fold. The score is
  * bucketed to hundreds exactly so tie blocks are real: an AUC over a
  * near-continuous score would never exercise the tie arithmetic.
  */
object Auc {

  /** Exact tie-corrected AUC of `score` predicting `isPos`, one row
    * per `key`. Emits (key, n_pos, n_neg, two_r_pos, auc). Factored
    * so the spec can pin textbook rankings (perfect / inverted /
    * random-tie half credit) and the one-class NULL guard.
    */
  def aucByKey(df: DataFrame, key: Column, isPos: Column, score: Column): DataFrame = {
    val byScore = Window.partitionBy(col("graft_k")).orderBy(col("graft_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(key.as("graft_k"), isPos.as("graft_p"), score.as("graft_s"))
      .groupBy(col("graft_k"), col("graft_s"))
      .agg(
        sum(when(col("graft_p"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("graft_p"), 1L).otherwise(0L)).as("c0"))
      .withColumn("ct", col("c1") + col("c0"))
      .withColumn("graft_cb", sum(col("ct")).over(byScore) - col("ct"))
      .groupBy(col("graft_k").as("key"))
      .agg(
        sum(col("c1")).as("n_pos"),
        sum(col("c0")).as("n_neg"),
        sum(col("c1") * (lit(2) * col("graft_cb") + col("ct") + 1)).as("two_r_pos"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("two_r_pos") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
          .otherwise(lit(null).cast("double")))
  }

  val q190 = Q.of(
    "q190_auc_roc",
    """WITH s AS (
      |  SELECT c_mktsegment AS key,
      |    o_orderstatus = 'F' AS pos,
      |    CAST(FLOOR(o_totalprice / 100.0) AS BIGINT) AS score
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |), c AS (
      |  SELECT key, score,
      |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS c0
      |  FROM s GROUP BY key, score
      |), cum AS (
      |  SELECT key, c1, c0, c1 + c0 AS ct,
      |    SUM(c1 + c0) OVER (PARTITION BY key ORDER BY score) - (c1 + c0) AS cb
      |  FROM c
      |), folded AS (
      |  SELECT key,
      |    CAST(SUM(c1) AS BIGINT) AS n_pos,
      |    CAST(SUM(c0) AS BIGINT) AS n_neg,
      |    CAST(SUM(c1 * (2 * cb + ct + 1)) AS BIGINT) AS two_r_pos
      |  FROM cum GROUP BY key
      |)
      |SELECT key, n_pos, n_neg, two_r_pos,
      |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |    CAST(two_r_pos - n_pos * (n_pos + 1) AS DOUBLE)
      |      / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
      |  ELSE NULL END AS auc
      |FROM folded
      |ORDER BY key""".stripMargin) { t =>
    aucByKey(
      t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderstatus"), col("o_totalprice")),
      col("c_mktsegment"),
      col("o_orderstatus") === "F",
      floor(col("o_totalprice") / 100.0).cast("long"))
      .orderBy(col("key"))
  }

  def all: Seq[Q] = Seq(q190)
}
