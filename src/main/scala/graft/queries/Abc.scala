package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.PrefixSum

/** q182: ABC / PARETO INVENTORY CLASSIFICATION — parts ranked by
  * revenue, classified by where their cumulative share STARTS:
  * class A while below 70% of total, B while below 90%, C for the
  * tail (the standard 70/90 inventory-control cut, public ops canon;
  * q157 measures the concentration curve's area, q159 takes the 2-D
  * frontier — this is the actionable SEGMENTATION read of the same
  * skew: "which sliver of the catalog carries the business").
  *
  * First-crossing-included rule, all-integer: a part belongs to the
  * lowest class whose threshold its PREDECESSOR mass has not reached —
  * (cum − rev)·10 < total·7 ⟹ A — so the straddling part lands in
  * the class it completes, ties impossible (integer cross-multiply,
  * never a float share compare; the q177 rule). Revenue is
  * floor-dollar int64; ordering is (revenue DESC, partkey) so the
  * rank is a total order both engines replay.
  *
  * Scale shape: ONE map-side-combined l_partkey aggregate collapses
  * the fact (the only fact-sized exchange); the cumulative revenue
  * rides [[graft.operators.PrefixSum.orderedRunningSum]] over the
  * (rev DESC, partkey) total order — range-partition + bounded
  * driver offsets + per-partition windows, NEVER a single-task
  * global window: the part catalog SCALES with the fact (TPC-H part
  * grows with SF), so q182 is exactly the q157/q161 frame class, not
  * a bounded-alphabet one (the round-12 whitelist-rationale lesson).
  * The grand total rides a one-row crossJoin(broadcast(agg)) — the
  * q127 pattern — not an empty-partition max window. The class
  * rollup is 3 rows. Share is one IEEE division of exact integers.
  */
object Abc {

  /** Classify per-key integer masses into A/B/C by cumulative share.
    * Emits (abc_class, n_keys, class_revenue, revenue_share).
    * Factored so the spec can pin a whale-takes-A distribution, the
    * straddle rule at an exact 70% landing, and the uniform case.
    */
  def classify(masses: DataFrame, keyCol: String, revCol: String): DataFrame = {
    val cum = PrefixSum.orderedRunningSum(
      masses, orderBy = Seq(col(revCol).desc, col(keyCol)),
      value = col(revCol), outCol = "graft_cum", numPartitions = 8)
    val tot = masses.agg(sum(col(revCol)).cast("long").as("graft_total"))
    cum.crossJoin(broadcast(tot))
      .withColumn("abc_class",
        when((col("graft_cum") - col(revCol)) * 10 < col("graft_total") * 7, "A")
          .when((col("graft_cum") - col(revCol)) * 10 < col("graft_total") * 9, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col(revCol)).as("class_revenue"),
        (sum(col(revCol)).cast("double") / max(col("graft_total")))
          .as("revenue_share"))
  }

  val q182 = Q.of(
    "q182_abc_classification",
    """WITH m AS (
      |  SELECT l_partkey AS k, SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS rev
      |  FROM lineitem GROUP BY 1
      |), c AS (
      |  SELECT k, rev,
      |    SUM(rev) OVER (ORDER BY rev DESC, k) AS cum,
      |    SUM(rev) OVER () AS total
      |  FROM m
      |), cls AS (
      |  SELECT CASE
      |      WHEN (cum - rev) * 10 < total * 7 THEN 'A'
      |      WHEN (cum - rev) * 10 < total * 9 THEN 'B'
      |      ELSE 'C' END AS abc_class,
      |    rev, total
      |  FROM c
      |)
      |SELECT abc_class,
      |  CAST(COUNT(*) AS BIGINT) AS n_keys,
      |  CAST(SUM(rev) AS BIGINT) AS class_revenue,
      |  CAST(CAST(SUM(rev) AS BIGINT) AS DOUBLE) / MAX(total) AS revenue_share
      |FROM cls
      |GROUP BY abc_class
      |ORDER BY abc_class""".stripMargin) { t =>
    classify(
      t.lineitem
        .groupBy(col("l_partkey").as("k"))
        .agg(sum(floor(col("l_extendedprice")).cast("long")).as("rev")),
      "k", "rev")
      .orderBy(col("abc_class"))
  }

  def all: Seq[Q] = Seq(q182)
}
