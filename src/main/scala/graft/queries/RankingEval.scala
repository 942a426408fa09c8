package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q175: NDCG@10 / precision / recall RANKING EVALUATION — the
  * offline recommender scorecard: rank each customer's parts by
  * train-period purchase count, hold out the post-split period as
  * ground truth, and score the ranking per customer (DCG with the
  * standard 1/log₂(i+1) gain discount, Järvelin & Kekäläinen 2002,
  * public). The EVALUATION side of q69/q167: those produce
  * rankings/training pairs; every pipeline that retrains a ranker
  * needs this readout before shipping it.
  *
  * Definitions pinned for determinism: the ranking is top-10 by
  * (count desc, part asc) — the q08 total-order tiebreak; IDCG is
  * taken over the PRESENTED list (Σ of the first min(R, n_ranked)
  * discount weights, R = the customer's held-out distinct parts), so
  * both engines fold the SAME frame and no synthetic 1..k series is
  * generated; R = 0 guards NDCG/recall to NULL. Each DCG term is
  * rel/log₂(rk+1) — IEEE from exact integers, identical tokens both
  * engines — quantized to DECIMAL(20,6) so the per-customer sum is
  * order-independent (§6 D20_6 routing); NDCG/precision/recall are
  * single IEEE divisions of exact operands (q128 rule, no rounding).
  *
  * Scale shape: one (cust, part) train aggregate (map-side
  * combined), one per-customer top-10 window over it (rows past
  * rank 10 dropped before anything downstream — q164 discipline),
  * one distinct holdout frame joined on (cust, part), and a bounded
  * ≤10-rows-per-customer rollup. The date split pushes into both
  * scans; nothing quadratic anywhere.
  */
object RankingEval {

  private val K = 10
  private val Split = "2000-01-01"

  /** Per-key ranking metrics of `ranked` (key, item, rk) against
    * holdout `truth` (key, item). Factored so the spec can pin
    * textbook DCG arithmetic, the perfect/inverted rankings, and
    * the R = 0 guard.
    */
  def ndcgAtK(ranked: DataFrame, truth: DataFrame): DataFrame = {
    val r = truth.groupBy(col("key")).agg(count(lit(1)).as("n_test"))
    val w = lit(1.0) / log2(col("rk").cast("double") + 1.0)
    ranked
      .join(truth.withColumn("graft_rel", lit(1L)), Seq("key", "item"), "left")
      .na.fill(0L, Seq("graft_rel"))
      .join(r, Seq("key"), "left")
      .na.fill(0L, Seq("n_test"))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_ranked"),
        first(col("n_test")).as("n_test"),
        sum(col("graft_rel")).as("hits"),
        sum((col("graft_rel").cast("double") * w).cast(det.D20_6)).as("graft_dcg"),
        sum(when(col("rk") <= col("n_test"), w).otherwise(lit(0.0))
          .cast(det.D20_6)).as("graft_idcg"))
      .select(
        col("key"), col("n_ranked"), col("n_test"), col("hits"),
        col("graft_dcg").cast("double").as("dcg"),
        col("graft_idcg").cast("double").as("idcg"),
        when(col("n_test") > 0,
          col("graft_dcg").cast("double") / col("graft_idcg").cast("double"))
          .as("ndcg"),
        (col("hits").cast("double") / col("n_ranked").cast("double"))
          .as("precision_at_k"),
        when(col("n_test") > 0,
          col("hits").cast("double") / col("n_test").cast("double"))
          .as("recall"))
  }

  val q175 = Q.of(
    "q175_ndcg_eval",
    s"""WITH train AS (
      |  SELECT o_custkey AS key, l_partkey AS item, COUNT(*) AS cnt
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE o_orderdate < TIMESTAMP '$Split'
      |  GROUP BY 1, 2
      |), top AS (
      |  SELECT key, item, rk FROM (
      |    SELECT key, item,
      |      ROW_NUMBER() OVER (PARTITION BY key ORDER BY cnt DESC, item) AS rk
      |    FROM train)
      |  WHERE rk <= $K
      |), test AS (
      |  SELECT DISTINCT o_custkey AS key, l_partkey AS item
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE o_orderdate >= TIMESTAMP '$Split'
      |), tc AS (
      |  SELECT key, COUNT(*) AS n_test FROM test GROUP BY key
      |), scored AS (
      |  SELECT t.key, t.rk,
      |    CASE WHEN x.item IS NOT NULL THEN 1 ELSE 0 END AS rel,
      |    COALESCE(tc.n_test, 0) AS n_test
      |  FROM top t
      |  LEFT JOIN test x ON x.key = t.key AND x.item = t.item
      |  LEFT JOIN tc ON tc.key = t.key
      |), per AS (
      |  SELECT key, COUNT(*) AS n_ranked, MAX(n_test) AS n_test,
      |    CAST(SUM(rel) AS BIGINT) AS hits,
      |    SUM(CAST(CAST(rel AS DOUBLE) * (1.0 / log2(CAST(rk + 1 AS DOUBLE)))
      |      AS DECIMAL(20,6))) AS dcg_d,
      |    SUM(CAST(CASE WHEN rk <= n_test
      |        THEN 1.0 / log2(CAST(rk + 1 AS DOUBLE)) ELSE 0.0 END
      |      AS DECIMAL(20,6))) AS idcg_d
      |  FROM scored GROUP BY key
      |)
      |SELECT key, n_ranked, n_test, hits,
      |  CAST(dcg_d AS DOUBLE) AS dcg,
      |  CAST(idcg_d AS DOUBLE) AS idcg,
      |  CASE WHEN n_test > 0
      |    THEN CAST(dcg_d AS DOUBLE) / CAST(idcg_d AS DOUBLE) END AS ndcg,
      |  CAST(hits AS DOUBLE) / CAST(n_ranked AS DOUBLE) AS precision_at_k,
      |  CASE WHEN n_test > 0
      |    THEN CAST(hits AS DOUBLE) / CAST(n_test AS DOUBLE) END AS recall
      |FROM per
      |ORDER BY key""".stripMargin) { t =>
    val fact = t.orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .join(t.lineitem.select(col("l_orderkey"), col("l_partkey")),
        col("l_orderkey") === col("o_orderkey"))
    val train = fact
      .filter(col("o_orderdate") < lit(Split).cast("timestamp"))
      .groupBy(col("o_custkey").as("key"), col("l_partkey").as("item"))
      .agg(count(lit(1)).as("graft_cnt"))
    val byCnt = Window.partitionBy(col("key"))
      .orderBy(col("graft_cnt").desc, col("item"))
    val top = train
      .withColumn("rk", row_number().over(byCnt))
      .filter(col("rk") <= K)
      .select(col("key"), col("item"), col("rk"))
    val test = fact
      .filter(col("o_orderdate") >= lit(Split).cast("timestamp"))
      .select(col("o_custkey").as("key"), col("l_partkey").as("item"))
      .distinct()
    ndcgAtK(top, test).orderBy(col("key"))
  }

  // ---- q189: MRR / MAP@K --------------------------------------------

  /** Per-key MRR and MAP@K of `ranked` (key, item, rk) against
    * holdout `truth` (key, item) — the navigational (first-hit) and
    * rank-averaged companions of q175's graded NDCG: MRR reads "how
    * deep does the user dig for the first good item", AP averages
    * precision at every hit so EVERY relevant position matters
    * (TREC canon, public). Same determinism routing as q175: each
    * precision@i = cum_hits/i is one IEEE division of exact integers,
    * quantized to D20_6 before the per-key sum; the AP normalizer
    * min(R, K) is integer; RR = 1/first_hit_rank is a single
    * division, 0.0 when nothing in the list is relevant, NULL when
    * the key has no holdout at all (no truth ⇒ no claim). One
    * cumulative window per key over the ≤K-row ranked frame — the
    * only addition to q175's plan shape.
    */
  def mrrMapAtK(ranked: DataFrame, truth: DataFrame, k: Int = K): DataFrame = {
    val r = truth.groupBy(col("key")).agg(count(lit(1)).as("n_test"))
    val byRk = Window.partitionBy(col("key")).orderBy(col("rk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .join(truth.withColumn("graft_rel", lit(1L)), Seq("key", "item"), "left")
      .na.fill(0L, Seq("graft_rel"))
      .withColumn("graft_cum", sum(col("graft_rel")).over(byRk))
      .join(r, Seq("key"), "left")
      .na.fill(0L, Seq("n_test"))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_ranked"),
        first(col("n_test")).as("n_test"),
        sum(col("graft_rel")).as("hits"),
        min(when(col("graft_rel") === 1L, col("rk"))).as("first_hit_rank"),
        sum(when(col("graft_rel") === 1L,
          (col("graft_cum").cast("double") / col("rk").cast("double"))
            .cast(det.D20_6)).otherwise(lit(0.0).cast(det.D20_6)))
          .as("graft_ap_num"))
      .select(
        col("key"), col("n_ranked"), col("n_test"), col("hits"),
        col("first_hit_rank"),
        when(col("n_test") === 0, lit(null).cast("double"))
          .when(col("first_hit_rank").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("first_hit_rank").cast("double"))
          .as("rr"),
        when(col("n_test") > 0,
          col("graft_ap_num").cast("double") /
            least(col("n_test"), lit(k.toLong)).cast("double"))
          .as("ap_at_k"))
  }

  val q189 = Q.of(
    "q189_mrr_map",
    s"""WITH train AS (
      |  SELECT o_custkey AS key, l_partkey AS item, COUNT(*) AS cnt
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE o_orderdate < TIMESTAMP '$Split'
      |  GROUP BY 1, 2
      |), top AS (
      |  SELECT key, item, rk FROM (
      |    SELECT key, item,
      |      ROW_NUMBER() OVER (PARTITION BY key ORDER BY cnt DESC, item) AS rk
      |    FROM train)
      |  WHERE rk <= $K
      |), test AS (
      |  SELECT DISTINCT o_custkey AS key, l_partkey AS item
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE o_orderdate >= TIMESTAMP '$Split'
      |), tc AS (
      |  SELECT key, COUNT(*) AS n_test FROM test GROUP BY key
      |), scored AS (
      |  SELECT t.key, t.rk,
      |    CASE WHEN x.item IS NOT NULL THEN 1 ELSE 0 END AS rel,
      |    COALESCE(tc.n_test, 0) AS n_test
      |  FROM top t
      |  LEFT JOIN test x ON x.key = t.key AND x.item = t.item
      |  LEFT JOIN tc ON tc.key = t.key
      |), cum AS (
      |  SELECT key, rk, rel, n_test,
      |    SUM(rel) OVER (PARTITION BY key ORDER BY rk) AS cumrel
      |  FROM scored
      |), per AS (
      |  SELECT key, COUNT(*) AS n_ranked, MAX(n_test) AS n_test,
      |    CAST(SUM(rel) AS BIGINT) AS hits,
      |    MIN(CASE WHEN rel = 1 THEN rk END) AS first_hit_rank,
      |    SUM(CASE WHEN rel = 1
      |      THEN CAST(CAST(cumrel AS DOUBLE) / CAST(rk AS DOUBLE)
      |        AS DECIMAL(20,6))
      |      ELSE CAST(0.0 AS DECIMAL(20,6)) END) AS ap_num
      |  FROM cum GROUP BY key
      |)
      |SELECT key,
      |  CAST(n_ranked AS BIGINT) AS n_ranked,
      |  CAST(n_test AS BIGINT) AS n_test,
      |  hits,
      |  CAST(first_hit_rank AS BIGINT) AS first_hit_rank,
      |  CASE WHEN n_test = 0 THEN NULL
      |       WHEN first_hit_rank IS NULL THEN 0.0
      |       ELSE 1.0 / CAST(first_hit_rank AS DOUBLE) END AS rr,
      |  CASE WHEN n_test > 0
      |    THEN CAST(ap_num AS DOUBLE) /
      |      CAST(LEAST(n_test, $K) AS DOUBLE) END AS ap_at_k
      |FROM per
      |ORDER BY key""".stripMargin) { t =>
    val fact = t.orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .join(t.lineitem.select(col("l_orderkey"), col("l_partkey")),
        col("l_orderkey") === col("o_orderkey"))
    val train = fact
      .filter(col("o_orderdate") < lit(Split).cast("timestamp"))
      .groupBy(col("o_custkey").as("key"), col("l_partkey").as("item"))
      .agg(count(lit(1)).as("graft_cnt"))
    val byCnt = Window.partitionBy(col("key"))
      .orderBy(col("graft_cnt").desc, col("item"))
    val top = train
      .withColumn("rk", row_number().over(byCnt))
      .filter(col("rk") <= K)
      .select(col("key"), col("item"), col("rk"))
    val test = fact
      .filter(col("o_orderdate") >= lit(Split).cast("timestamp"))
      .select(col("o_custkey").as("key"), col("l_partkey").as("item"))
      .distinct()
    mrrMapAtK(top, test).orderBy(col("key"))
  }

  def all: Seq[Q] = Seq(q175, q189)
}
