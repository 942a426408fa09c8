package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q192: WELCH's unequal-variance t-test per stratum — the parametric
  * two-sample companion of q171 (KS) and q172 (Mann–Whitney): does
  * the AUTOMOBILE segment place larger orders than HOUSEHOLD within
  * each order priority, without assuming the two segments share a
  * variance (Welch 1947, public; the default two-sample test in every
  * modern stats package precisely because the equal-variance Student
  * form is unsafe under imbalance). Emits t and the Welch–
  * Satterthwaite effective degrees of freedom.
  *
  * Determinism: per-(stratum, side) moments n, Σx, Σx² are exact
  * D28_6 decimal sums (§6 routing — x² ≈ 2.5e11 per row needs the
  * wide lane); mean and the dvar expression
  * (n·Σx² − (Σx)²)/(n·(n−1)) are then FIXED IEEE sequences over
  * exact operands, written token-identically in the oracle; t and df
  * are single expressions over those — both rounded to 4 (they chain
  * enough IEEE ops that the token-identity rule, not exactness, is
  * what holds them together; round-4 mirrors q172's z). Strata where
  * either side has n < 2 or where se² = 0 guard to NULL.
  *
  * Scale shape: ONE fact scan (orders ⋈ broadcast customer) folding
  * into ≤ 2·strata moment cells via map-side combine — the exchange
  * carries cells, never rows. The same single-pass moment layout an
  * executor fleet would use at 100 TB.
  */
object Welch {

  private val SegA = "AUTOMOBILE"
  private val SegB = "HOUSEHOLD"

  /** Welch t + Satterthwaite df of `v` between `isA` rows and the
    * rest, per `key`. Factored so the spec can pin hand-computed
    * moments, the equal-sample symmetry t(a,b) = −t(b,a), the
    * zero-variance guard, and a fixed-seed differential vs an
    * independent two-pass reference.
    */
  def welchByKey(df: DataFrame, key: Column, isA: Column, v: Column): DataFrame = {
    def side(flag: Column, c: Column): Column = when(flag, c)
    val d = df.select(key.as("key"), isA.as("graft_a"), v.as("graft_v"))
    val agg = d.groupBy(col("key")).agg(
      count(when(col("graft_a"), 1)).as("n1"),
      count(when(!col("graft_a"), 1)).as("n2"),
      sum(side(col("graft_a"), col("graft_v")).cast(det.D28_6)).as("graft_s1a"),
      sum(side(col("graft_a"), col("graft_v") * col("graft_v")).cast(det.D28_6))
        .as("graft_s2a"),
      sum(side(!col("graft_a"), col("graft_v")).cast(det.D28_6)).as("graft_s1b"),
      sum(side(!col("graft_a"), col("graft_v") * col("graft_v")).cast(det.D28_6))
        .as("graft_s2b"))
    val n1d = col("n1").cast("double"); val n2d = col("n2").cast("double")
    val m1 = col("graft_s1a").cast("double") / n1d
    val m2 = col("graft_s1b").cast("double") / n2d
    // n >= 2 guards sit INSIDE the expression: ANSI mode turns the
    // n·(n−1) = 0 denominator into a runtime error, not an inf.
    val v1 = when(col("n1") >= 2,
      (n1d * col("graft_s2a").cast("double") -
        col("graft_s1a").cast("double") * col("graft_s1a").cast("double")) /
        (n1d * (n1d - lit(1.0))))
    val v2 = when(col("n2") >= 2,
      (n2d * col("graft_s2b").cast("double") -
        col("graft_s1b").cast("double") * col("graft_s1b").cast("double")) /
        (n2d * (n2d - lit(1.0))))
    agg
      .withColumn("graft_se2", v1 / n1d + v2 / n2d)
      .withColumn("graft_v1n", v1 / n1d)
      .withColumn("graft_v2n", v2 / n2d)
      .select(
        col("key"), col("n1"), col("n2"),
        round(m1, 4).as("mean1"),
        round(m2, 4).as("mean2"),
        when(col("n1") >= 2 && col("n2") >= 2 && col("graft_se2") > 0.0,
          round((m1 - m2) / sqrt(col("graft_se2")), 4))
          .otherwise(lit(null).cast("double")).as("t"),
        when(col("n1") >= 2 && col("n2") >= 2 && col("graft_se2") > 0.0,
          round((col("graft_se2") * col("graft_se2")) /
            (col("graft_v1n") * col("graft_v1n") / (n1d - lit(1.0)) +
              col("graft_v2n") * col("graft_v2n") / (n2d - lit(1.0))), 4))
          .otherwise(lit(null).cast("double")).as("df"))
  }

  val q192 = Q.of(
    "q192_welch_ttest",
    s"""WITH s AS (
      |  SELECT o_orderpriority AS key, c_mktsegment = '$SegA' AS a,
      |    o_totalprice AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('$SegA', '$SegB')
      |), m AS (
      |  SELECT key,
      |    COUNT(CASE WHEN a THEN 1 END) AS n1,
      |    COUNT(CASE WHEN NOT a THEN 1 END) AS n2,
      |    SUM(CASE WHEN a THEN CAST(v AS DECIMAL(28,6)) END) AS s1a,
      |    SUM(CASE WHEN a THEN CAST(v * v AS DECIMAL(28,6)) END) AS s2a,
      |    SUM(CASE WHEN NOT a THEN CAST(v AS DECIMAL(28,6)) END) AS s1b,
      |    SUM(CASE WHEN NOT a THEN CAST(v * v AS DECIMAL(28,6)) END) AS s2b
      |  FROM s GROUP BY key
      |), e AS (
      |  SELECT key, n1, n2,
      |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
      |    CAST(CAST(s1a AS VARCHAR) AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
      |    CAST(CAST(s1b AS VARCHAR) AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
      |    CASE WHEN n1 >= 2 THEN
      |      (CAST(n1 AS DOUBLE) * CAST(CAST(s2a AS VARCHAR) AS DOUBLE)
      |        - CAST(CAST(s1a AS VARCHAR) AS DOUBLE) * CAST(CAST(s1a AS VARCHAR) AS DOUBLE))
      |        / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) END AS v1,
      |    CASE WHEN n2 >= 2 THEN
      |      (CAST(n2 AS DOUBLE) * CAST(CAST(s2b AS VARCHAR) AS DOUBLE)
      |        - CAST(CAST(s1b AS VARCHAR) AS DOUBLE) * CAST(CAST(s1b AS VARCHAR) AS DOUBLE))
      |        / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) END AS v2
      |  FROM m
      |), f AS (
      |  SELECT key, n1, n2, m1, m2,
      |    v1 / n1d + v2 / n2d AS se2,
      |    v1 / n1d AS v1n, v2 / n2d AS v2n, n1d, n2d
      |  FROM e
      |)
      |SELECT key, n1, n2,
      |  round(m1, 4) AS mean1,
      |  round(m2, 4) AS mean2,
      |  CASE WHEN n1 >= 2 AND n2 >= 2 AND se2 > 0.0
      |    THEN round((m1 - m2) / sqrt(se2), 4) END AS t,
      |  CASE WHEN n1 >= 2 AND n2 >= 2 AND se2 > 0.0
      |    THEN round((se2 * se2) /
      |      (v1n * v1n / (n1d - 1.0) + v2n * v2n / (n2d - 1.0)), 4)
      |  END AS df
      |FROM f
      |ORDER BY key""".stripMargin) { t =>
    welchByKey(
      t.orders
        .join(broadcast(t.customer
          .filter(col("c_mktsegment").isin(SegA, SegB))
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderpriority"), col("c_mktsegment"), col("o_totalprice")),
      col("o_orderpriority"),
      col("c_mktsegment") === SegA,
      col("o_totalprice"))
      .orderBy(col("key"))
  }

  def all: Seq[Q] = Seq(q192)
}
