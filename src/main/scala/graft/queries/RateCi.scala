package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** q216: TWO-PROPORTION CONFIDENCE INTERVAL — Wilson score intervals
  * per arm + the Newcombe hybrid interval for the rate DIFFERENCE
  * (Wilson 1927; Newcombe 1998 — both public): the binary-outcome
  * readout every A/B dashboard shows, with the interval that stays
  * honest at small n and extreme rates where the naive Wald CI
  * collapses (p̂ ± z√(p̂q̂/n) is vacuous at s = 0; Wilson is not).
  * Completes the experimentation tier for BINARY metrics the way
  * q211 does for continuous ones.
  *
  * Determinism: arms are the q79 md5 split; n and s are exact
  * integers; every derived number (p̂, Wilson center/half-width,
  * Newcombe bounds) is a FIXED IEEE chain over exact integer casts,
  * token-identical in the oracle (sqrt is IEEE-exact). The
  * significance flag compares the identically-derived bounds to 0.0.
  * n = 0 arms guard to NULL.
  *
  * Scale shape: ONE orders scan → per-customer conversion cells
  * (map-side combined) → 2 arm cells → one row. Nothing but cells
  * cross any exchange.
  */
object RateCi {

  private val Z = 1.96

  /** Wilson lower/upper for (s, n) as fixed IEEE chains. */
  private def wilson(s: Column, n: Column): (Column, Column) = {
    val nD = n.cast("double")
    val p = s.cast("double") / nD
    val z2 = lit(Z * Z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val half = lit(Z) * sqrt(p * (lit(1.0) - p) / nD
      + z2 / (lit(4.0) * nD * nD)) / denom
    (center - half, center + half)
  }

  /** One-row two-proportion readout over a (unit, converted) frame
    * with the md5 arm split. Factored so the spec can pin textbook
    * Wilson numbers, the s = 0 behavior, and the Newcombe bracket.
    */
  def rateCi(units: DataFrame, unit: Column, converted: Column): DataFrame = {
    val cells = units
      .select(unit.as("graft_u"), converted.cast("long").as("graft_y"))
      .withColumn("graft_arm",
        when(md5(col("graft_u").cast("string")) < "80", "t").otherwise("c"))
      .groupBy(col("graft_arm"))
      .agg(count(lit(1)).as("graft_n"), sum(col("graft_y")).as("graft_s"))
    val f = cells.agg(
      sum(when(col("graft_arm") === "t", col("graft_n"))).cast("long").as("n_t"),
      sum(when(col("graft_arm") === "t", col("graft_s"))).cast("long").as("s_t"),
      sum(when(col("graft_arm") === "c", col("graft_n"))).cast("long").as("n_c"),
      sum(when(col("graft_arm") === "c", col("graft_s"))).cast("long").as("s_c"))
    val pT = col("s_t").cast("double") / col("n_t").cast("double")
    val pC = col("s_c").cast("double") / col("n_c").cast("double")
    val (l1, u1) = wilson(col("s_t"), col("n_t"))
    val (l2, u2) = wilson(col("s_c"), col("n_c"))
    val d = pT - pC
    val lo = d - sqrt((pT - l1) * (pT - l1) + (u2 - pC) * (u2 - pC))
    val hi = d + sqrt((u1 - pT) * (u1 - pT) + (pC - l2) * (pC - l2))
    f.select(
      col("n_t"), col("s_t"), col("n_c"), col("s_c"),
      pT.as("p_t"), pC.as("p_c"), d.as("diff"),
      lo.as("lo95"), hi.as("hi95"),
      (lo > 0.0 || hi < 0.0).as("significant"))
  }

  val q216 = Q.of(
    "q216_rate_ci",
    """WITH units AS (
      |  SELECT o_custkey AS u,
      |    MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
      |  FROM orders GROUP BY 1
      |), cells AS (
      |  SELECT CASE WHEN md5(CAST(u AS VARCHAR)) < '80' THEN 't' ELSE 'c' END
      |    AS arm, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS s
      |  FROM units GROUP BY 1
      |), f AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 't' THEN n END) AS BIGINT) AS n_t,
      |    CAST(SUM(CASE WHEN arm = 't' THEN s END) AS BIGINT) AS s_t,
      |    CAST(SUM(CASE WHEN arm = 'c' THEN n END) AS BIGINT) AS n_c,
      |    CAST(SUM(CASE WHEN arm = 'c' THEN s END) AS BIGINT) AS s_c
      |  FROM cells
      |), w AS (
      |  SELECT n_t, s_t, n_c, s_c,
      |    CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS pt,
      |    CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS pc,
      |    ((CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
      |      + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2.0 * CAST(n_t AS DOUBLE)))
      |     / (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n_t AS DOUBLE))) AS ct,
      |    (1.96 * SQRT(CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
      |        * (1.0 - CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE))
      |        / CAST(n_t AS DOUBLE)
      |      + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (4.0 * CAST(n_t AS DOUBLE) * CAST(n_t AS DOUBLE)))
      |     / (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n_t AS DOUBLE))) AS ht,
      |    ((CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)
      |      + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2.0 * CAST(n_c AS DOUBLE)))
      |     / (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n_c AS DOUBLE))) AS cc,
      |    (1.96 * SQRT(CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)
      |        * (1.0 - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))
      |        / CAST(n_c AS DOUBLE)
      |      + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (4.0 * CAST(n_c AS DOUBLE) * CAST(n_c AS DOUBLE)))
      |     / (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n_c AS DOUBLE))) AS hc
      |  FROM f
      |), e AS (
      |  SELECT n_t, s_t, n_c, s_c, pt, pc, pt - pc AS d,
      |    pt - pc - SQRT((pt - (ct - ht)) * (pt - (ct - ht))
      |      + ((cc + hc) - pc) * ((cc + hc) - pc)) AS lo,
      |    pt - pc + SQRT(((ct + ht) - pt) * ((ct + ht) - pt)
      |      + (pc - (cc - hc)) * (pc - (cc - hc))) AS hi
      |  FROM w
      |)
      |SELECT n_t, s_t, n_c, s_c, pt AS p_t, pc AS p_c, d AS diff,
      |  lo AS lo95, hi AS hi95,
      |  lo > 0.0 OR hi < 0.0 AS significant
      |FROM e""".stripMargin) { t =>
    rateCi(
      t.orders.groupBy(col("o_custkey").as("u"))
        .agg(max(when(col("o_orderpriority") === "1-URGENT", 1L)
          .otherwise(0L)).as("y")),
      col("u"), col("y"))
  }

  def all: Seq[Q] = Seq(q216)
}
