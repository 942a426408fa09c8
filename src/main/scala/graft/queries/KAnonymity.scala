package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** q135: K-ANONYMITY audit — the structural-privacy complement of
  * q87's PII redaction (which scrubs VALUES; this measures whether
  * the remaining QUASI-IDENTIFIERS still isolate individuals): every
  * combination of quasi-identifier values whose group has fewer than
  * k members is a re-identification risk, and the standard remedy is
  * GENERALIZATION — coarsen one attribute and re-measure. Both
  * levels are computed in ONE pass via GROUPING SETS ((nation,
  * segment), (segment)) — the q105 machinery pointed at governance:
  * the fine level carries the risk audit, the coarsened level shows
  * what generalizing the nation away would achieve.
  *
  * Scale shape: one Expand + one aggregate exchange (never a scan
  * per level), output bounded by the quasi-identifier domain; the
  * at-risk row count is a conditional sum over the SAME aggregate.
  * All integers — exact.
  */
object KAnonymity {

  private val K = 10

  /** Two-level k-anonymity report over quasi-identifiers (a, b):
    * group sizes at (a, b) and at (b), each row flagged when its
    * group is smaller than k. Factored so the spec can pin a crafted
    * singleton-group audit and the generalization repair.
    */
  def audit(df: DataFrame, a: Column, b: Column, k: Int): DataFrame =
    df.groupingSets(Seq(Seq(a, b), Seq(b)), a, b)
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"))
      .select(
        when(col("gid") === 0, lit("quasi")).otherwise(lit("generalized"))
          .as("level"),
        coalesce(a.cast("string"), lit("ALL")).as("qa"),
        b.cast("string").as("qb"),
        col("n"),
        (col("n") < k).as("at_risk"))

  val q135 = Q.of(
    "q135_k_anonymity",
    s"""SELECT CASE WHEN grouping_id(c_nationkey, c_mktsegment) = 0
      |    THEN 'quasi' ELSE 'generalized' END AS level,
      |  COALESCE(CAST(c_nationkey AS VARCHAR), 'ALL') AS qa,
      |  CAST(c_mktsegment AS VARCHAR) AS qb,
      |  COUNT(*) AS n,
      |  COUNT(*) < $K AS at_risk
      |FROM customer
      |GROUP BY GROUPING SETS ((c_nationkey, c_mktsegment), (c_mktsegment))
      |ORDER BY level, qa, qb""".stripMargin) { t =>
    audit(t.customer, col("c_nationkey"), col("c_mktsegment"), K)
      .orderBy(col("level"), col("qa"), col("qb"))
  }

  def all: Seq[Q] = Seq(q135)
}
