package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q165: CHI-SQUARE INDEPENDENCE test over a contingency table —
  * does order priority depend on nation? The categorical-association
  * statistic (Pearson 1900, public) behind every "is this segment
  * behaving differently" readout, with Cramér's V as the
  * normalized effect size (χ² alone grows with n; V ∈ [0,1] is
  * comparable across tables). q143 tests one margin against a fixed
  * law; this tests two CATEGORICAL margins against each other.
  *
  * Determinism: cell counts are exact integers; expected counts
  * e = (row total · col total)/n are computed as ONE IEEE division
  * of exact integer products (row·col ≤ n² — within int64 for any
  * bounded table); each (o−e)²/e term routes through DECIMAL(20,6)
  * for the order-independent sum (§6); χ² and V round 4 (q11 rule).
  *
  * Scale shape: ONE map-side-combined (nation, priority) aggregate —
  * output bounded by the dim product — then marginals and the fold
  * as windows over that bounded frame; the dims broadcast into the
  * scan. Output: one row per cell with its contribution, χ²/V/dof
  * shared (the analyst reads WHICH cells drive the signal).
  */
object ChiSquare {

  /** Contingency χ² over (rowCol, colCol) of a pre-joined frame.
    * Factored so the spec can pin exact independence (χ² = 0), a
    * perfectly-associated 2×2 (V = 1), and the dof arithmetic.
    */
  def contingency(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val whole = Window.partitionBy()
    val byRow = Window.partitionBy(col(rowCol))
    val byCol = Window.partitionBy(col(colCol))
    val counts = df
      .groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).as("n_obs"))
    // densify: a ZERO cell still charges its full expected mass
    // ((0−e)²/e = e) — without the spine a perfectly-associated 2×2
    // reports χ² = n/2 instead of n (the missing diagonal's share)
    val spine = counts.select(col(rowCol)).distinct()
      .crossJoin(broadcast(counts.select(col(colCol)).distinct()))
    spine
      .join(counts, Seq(rowCol, colCol), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("graft_rt", sum(col("n_obs")).over(byRow))
      .withColumn("graft_ct", sum(col("n_obs")).over(byCol))
      .withColumn("graft_n", sum(col("n_obs")).over(whole))
      .withColumn("expected",
        (col("graft_rt") * col("graft_ct")).cast("double") /
          col("graft_n").cast("double"))
      .withColumn("graft_term",
        (pow(col("n_obs").cast("double") - col("expected"), 2) / col("expected"))
          .cast(det.D20_6))
      .withColumn("chi2", round(sum(col("graft_term")).over(whole).cast("double"), 4))
      .withColumn("graft_r", size(collect_set(col(rowCol)).over(whole)).cast("long"))
      .withColumn("graft_c", size(collect_set(col(colCol)).over(whole)).cast("long"))
      .withColumn("dof", (col("graft_r") - 1) * (col("graft_c") - 1))
      .withColumn("cramers_v",
        round(sqrt(sum(col("graft_term")).over(whole).cast("double") /
          (col("graft_n").cast("double") *
            least(col("graft_r") - 1, col("graft_c") - 1).cast("double"))), 4))
      .select(col(rowCol), col(colCol), col("n_obs"), col("expected"),
        col("chi2"), col("dof"), col("cramers_v"))
  }

  val q165 = Q.of(
    "q165_chi_square",
    """WITH joined AS (
      |  SELECT n.n_name, o.o_orderpriority
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |), counts AS (
      |  SELECT n_name, o_orderpriority, COUNT(*) AS n_obs
      |  FROM joined GROUP BY 1, 2
      |), cells AS (
      |  SELECT r.n_name, c.o_orderpriority, COALESCE(k.n_obs, 0) AS n_obs
      |  FROM (SELECT DISTINCT n_name FROM counts) r
      |  CROSS JOIN (SELECT DISTINCT o_orderpriority FROM counts) c
      |  LEFT JOIN counts k
      |    ON k.n_name = r.n_name AND k.o_orderpriority = c.o_orderpriority
      |), marg AS (
      |  SELECT n_name, o_orderpriority, n_obs,
      |    SUM(n_obs) OVER (PARTITION BY n_name) AS rt,
      |    SUM(n_obs) OVER (PARTITION BY o_orderpriority) AS ct,
      |    SUM(n_obs) OVER () AS n
      |  FROM cells
      |), terms AS (
      |  SELECT n_name, o_orderpriority, n_obs,
      |    CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
      |    CAST(pow(CAST(n_obs AS DOUBLE)
      |        - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE), 2)
      |      / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(20,6))
      |      AS term,
      |    n
      |  FROM marg
      |), folded AS (
      |  SELECT n_name, o_orderpriority, n_obs, expected, n,
      |    round(CAST(SUM(term) OVER () AS DOUBLE), 4) AS chi2,
      |    CAST(SUM(term) OVER () AS DOUBLE) AS chi2_raw,
      |    COUNT(DISTINCT n_name) OVER () AS r,
      |    COUNT(DISTINCT o_orderpriority) OVER () AS c
      |  FROM terms
      |)
      |SELECT n_name, o_orderpriority,
      |  CAST(n_obs AS BIGINT) AS n_obs,
      |  expected, chi2,
      |  CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
      |  round(sqrt(chi2_raw / (CAST(n AS DOUBLE) * CAST(LEAST(r - 1, c - 1) AS DOUBLE))), 4)
      |    AS cramers_v
      |FROM folded
      |ORDER BY n_name, o_orderpriority""".stripMargin) { t =>
    contingency(
      t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_orderpriority")),
      "n_name", "o_orderpriority")
      .orderBy(col("n_name"), col("o_orderpriority"))
  }

  def all: Seq[Q] = Seq(q165)
}
