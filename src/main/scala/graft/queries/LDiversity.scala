package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** q174: L-DIVERSITY audit — the release-gate that q135's
  * k-anonymity misses: a quasi-identifier group can be large (k-safe)
  * yet have every member share the SAME sensitive value, so an
  * attacker who locates the group learns the attribute without
  * isolating anyone (the homogeneity attack; Machanavajjhala 2006,
  * public). Per quasi-group: size, number of DISTINCT sensitive
  * values, the largest sensitive value's share, and the at-risk flag
  * when distinct < l. The sensitive attribute here is the account
  * standing derived from c_acctbal — the kind of financial tier a
  * privacy review actually protects.
  *
  * Scale shape: ONE map-side-combined (quasi..., sensitive)
  * aggregate — state bounded by the quasi×sensitive domain — then a
  * bounded per-group rollup; the max-share fold is max/sum over the
  * sensitive cells, never a second fact scan. All counts exact
  * integers; max_share is ONE IEEE division (q128 rule, bit-equal);
  * the flag compares integers.
  */
object LDiversity {

  private val L = 3

  /** Per-(a, b) group l-diversity over sensitive column `s`.
    * Factored so the spec can pin the homogeneous k-safe group
    * (the exact attack q135 misses), the diverse group, and the
    * max-share arithmetic.
    */
  def audit(df: DataFrame, a: Column, b: Column, s: Column, l: Int): DataFrame =
    df
      .groupBy(a.as("qa"), b.as("qb"), s.as("graft_s"))
      .agg(count(lit(1)).as("graft_c"))
      .groupBy(col("qa"), col("qb"))
      .agg(
        sum(col("graft_c")).as("n"),
        count(lit(1)).as("l_distinct"),
        max(col("graft_c")).as("graft_m"))
      .select(
        col("qa"), col("qb"), col("n"), col("l_distinct"),
        (col("graft_m").cast("double") / col("n").cast("double")).as("max_share"),
        (col("l_distinct") < l).as("at_risk"))

  val q174 = Q.of(
    "q174_l_diversity",
    s"""WITH cells AS (
      |  SELECT c_nationkey AS qa, c_mktsegment AS qb,
      |    CASE WHEN c_acctbal < 0 THEN 'delinquent'
      |         WHEN c_acctbal < 5000 THEN 'standard'
      |         ELSE 'premium' END AS s,
      |    COUNT(*) AS c
      |  FROM customer GROUP BY 1, 2, 3
      |)
      |SELECT qa, qb, CAST(SUM(c) AS BIGINT) AS n,
      |  COUNT(*) AS l_distinct,
      |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS max_share,
      |  COUNT(*) < $L AS at_risk
      |FROM cells GROUP BY qa, qb
      |ORDER BY qa, qb""".stripMargin) { t =>
    audit(
      t.customer,
      col("c_nationkey"), col("c_mktsegment"),
      when(col("c_acctbal") < 0, "delinquent")
        .when(col("c_acctbal") < 5000, "standard")
        .otherwise("premium"),
      L)
      .orderBy(col("qa"), col("qb"))
  }

  def all: Seq[Q] = Seq(q174)
}
