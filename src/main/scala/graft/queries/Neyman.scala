package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q243: NEYMAN ALLOCATION of a fixed sampling budget across strata
  * (Neyman 1934, public) — the DESIGN member of the sampling tier:
  * q78/q239 execute a sample, q160 apportions by pure counts; Neyman
  * allocates n_s ∝ N_s·σ_s (big AND volatile strata earn more
  * probes), the minimum-variance design for a stratified mean — the
  * "where do my 1000 QA probes go" answer. Integerization rides the
  * same largest-remainder discipline as q160: floors first, the
  * leftover seats to the largest fractional remainders with a
  * deterministic (remainder DESC, seg) tiebreak; the proportional
  * allocation (σ ignored) sits beside it as the naive baseline.
  *
  * Determinism: moments are exact decimals with §6(k) VARCHAR-bounced
  * oracle casts (the q242 surface); σ/weights are fixed IEEE chains
  * over identical doubles, with nw quantized D28_6 before the
  * cross-stratum sum (§6 — a data-ordered double total would make the
  * seat ranking order-sensitive); floors, remainder ranks, and seat
  * assignment are exact integer/window arithmetic on bit-identical
  * inputs. Both allocations sum EXACTLY to the budget by
  * construction.
  *
  * Scale shape: one orders scan → customer cells → |segments| moment
  * rows; the apportion windows run over |segments| rows.
  */
object Neyman {

  private val Budget = 1000L

  val q243 = Q.of(
    "q243_neyman_alloc",
    s"""WITH cust AS (
      |  SELECT c_custkey, c_mktsegment AS seg,
      |    SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS y
      |  FROM customer JOIN orders ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |), m AS (
      |  SELECT seg, COUNT(*) AS n,
      |    CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)
      |      AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS syy
      |  FROM cust GROUP BY seg
      |), w AS (
      |  SELECT seg, n,
      |    CAST(CAST(n AS DOUBLE) * sqrt((CAST(n AS DOUBLE) * syy - sy * sy)
      |      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS DECIMAL(28,6)) AS nw,
      |    CAST(n AS DOUBLE) AS pw
      |  FROM m WHERE n >= 2
      |), ideal AS (
      |  SELECT seg, n,
      |    $Budget * CAST(nw AS DOUBLE)
      |      / CAST((SELECT SUM(nw) FROM w) AS DOUBLE) AS ni,
      |    $Budget * pw / (SELECT SUM(pw) FROM w) AS pi
      |  FROM w
      |), seats AS (
      |  SELECT seg, n, ni, pi,
      |    CAST(floor(ni) AS BIGINT) AS nf, CAST(floor(pi) AS BIGINT) AS pf,
      |    ROW_NUMBER() OVER (ORDER BY ni - floor(ni) DESC, seg) AS nr,
      |    ROW_NUMBER() OVER (ORDER BY pi - floor(pi) DESC, seg) AS pr,
      |    (SELECT $Budget - SUM(CAST(floor(ni) AS BIGINT)) FROM ideal) AS nleft,
      |    (SELECT $Budget - SUM(CAST(floor(pi) AS BIGINT)) FROM ideal) AS pleft
      |  FROM ideal
      |)
      |SELECT seg, n AS stratum_size,
      |  nf + CASE WHEN nr <= nleft THEN 1 ELSE 0 END AS neyman_n,
      |  pf + CASE WHEN pr <= pleft THEN 1 ELSE 0 END AS proportional_n
      |FROM seats
      |ORDER BY seg""".stripMargin) { t =>
    val cust = t.customer
      .join(t.orders, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment").as("seg"))
      .agg(sum(col("o_totalprice").cast(det.D20_6)).as("y"))
    allocate(cust, Budget)
  }

  /** Largest-remainder Neyman + proportional allocation over a
    * (seg, y) customer frame. Factored so the spec can pin exact
    * budget conservation, the σ-tilt direction, and the equal-σ
    * collapse onto proportional.
    */
  def allocate(cust: DataFrame, budget: Long): DataFrame = {
    val m = cust.groupBy(col("seg")).agg(
      count(lit(1)).as("n"),
      sum(col("y")).cast("double").as("sy"),
      sum((col("y").cast("double") * col("y").cast("double"))
        .cast(det.D28_6)).cast("double").as("syy"))
    val nd = col("n").cast("double")
    // nw quantized D28_6 BEFORE the cross-stratum sum: the total is an
    // exact decimal fold (order-independent), so a last-bit difference
    // in double sum order can't flip floor() or a remainder-seat rank
    // cross-engine. pw stays double — exact integer values sum exactly.
    val w = m.filter(col("n") >= 2).select(col("seg"), col("n"),
      (nd * sqrt((nd * col("syy") - col("sy") * col("sy")) /
        (nd * (col("n") - 1).cast("double")))).cast(det.D28_6).as("nw"),
      nd.as("pw"))
    val tot = w.agg(sum(col("nw")).cast("double").as("tnw"),
      sum(col("pw")).as("tpw"))
    val ideal = w.crossJoin(broadcast(tot)).select(col("seg"), col("n"),
      (lit(budget) * col("nw").cast("double") / col("tnw")).as("ni"),
      (lit(budget) * col("pw") / col("tpw")).as("pi"))
    val fl = ideal
      .withColumn("nf", floor(col("ni")).cast("long"))
      .withColumn("pf", floor(col("pi")).cast("long"))
      .withColumn("nr", row_number().over(
        Window.orderBy((col("ni") - floor(col("ni"))).desc, col("seg")))
        .cast("long"))
      .withColumn("pr", row_number().over(
        Window.orderBy((col("pi") - floor(col("pi"))).desc, col("seg")))
        .cast("long"))
    val left = fl.agg(
      (lit(budget) - sum(col("nf"))).as("nleft"),
      (lit(budget) - sum(col("pf"))).as("pleft"))
    fl.crossJoin(broadcast(left))
      .select(col("seg"), col("n").as("stratum_size"),
        (col("nf") + when(col("nr") <= col("nleft"), 1L).otherwise(0L))
          .as("neyman_n"),
        (col("pf") + when(col("pr") <= col("pleft"), 1L).otherwise(0L))
          .as("proportional_n"))
      .orderBy(col("seg"))
  }

  def all: Seq[Q] = Seq(q243)
}
