package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q159: SKYLINE / PARETO FRONTIER (Börzsönyi et al. 2001, public) —
  * the parts no other part dominates on (price ↓, size ↑): the
  * multi-objective "best trade-offs" operator behind product
  * comparison, supplier selection, and hyperparameter picking, and a
  * genuinely missing relational primitive (no SQL aggregate spells
  * "not dominated").
  *
  * 2-D skylines need NO pairwise join: sort by price and the
  * frontier falls out of TWO window maxima — b dominates a iff
  * b.price ≤ a.price ∧ b.size ≥ a.size with one strict, so a
  * survives iff max(size | strictly cheaper) < a.size AND
  * max(size | same price) = a.size (ties on both axes keep all
  * co-located optima). That is one sort of the DISTINCT (price,
  * size) cell frame — the q156 cell-compression discipline: the
  * fact-sized work is the distinct aggregate; the sort touches only
  * cells. The oracle is the structurally different NOT EXISTS
  * spelling (quadratic — fine on a dim table, and the contrast IS
  * the point). All comparisons integer/exact-double — hash-exact.
  */
object Skyline {

  /** 2-D skyline (minimize `minCol`, maximize `maxCol`) over a cell
    * frame, one row per surviving (minCol, maxCol) cell with its
    * member count. Factored so the spec can pin a hand-drawn
    * frontier with interior, tied, and co-located points.
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val cells = df
      .groupBy(col(minCol), col(maxCol))
      .agg(count(lit(1)).as("n_members"))
    // same-price dominance first: only the price group's max-size cell
    // can survive (a bigger size at the SAME price dominates) — leaves
    // exactly one champion row per distinct price
    val samePrice = Window.partitionBy(col(minCol))
    val champions = cells
      .withColumn("graft_best_same", max(col(maxCol)).over(samePrice))
      .filter(col(maxCol) === col("graft_best_same"))
    // then strictly-cheaper dominance: a ROWS frame over the one-row-
    // per-price champion frame is exactly "all strictly cheaper prices"
    // (a RANGE -1 frame on a double price would mean "cheaper by >= 1",
    // silently missing sub-unit price steps)
    val prior = Window.orderBy(col(minCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    champions
      .withColumn("graft_best_cheaper", max(col(maxCol)).over(prior))
      .filter(col("graft_best_cheaper").isNull ||
        col("graft_best_cheaper") < col(maxCol))
      .select(col(minCol), col(maxCol), col("n_members"))
  }

  val q159 = Q.of(
    "q159_skyline_pareto",
    """WITH cells AS (
      |  SELECT p_retailprice, p_size, COUNT(*) AS n_members
      |  FROM part GROUP BY 1, 2
      |)
      |SELECT p_retailprice, p_size, CAST(n_members AS BIGINT) AS n_members
      |FROM cells a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM cells b
      |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
      |)
      |ORDER BY p_retailprice, p_size""".stripMargin) { t =>
    skyline2d(t.part, "p_retailprice", "p_size")
      .orderBy(col("p_retailprice"), col("p_size"))
  }

  def all: Seq[Q] = Seq(q159)
}
