package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q156: WEIGHTED MEDIAN — the 50 % point of the WEIGHT mass, not the
  * row count: per return flag, the price below which half the shipped
  * QUANTITY sits. The unweighted median (q10/q151) answers "the
  * typical row"; procurement/pricing wants "the typical unit", and no
  * built-in aggregate (Spark or DuckDB) expresses it — it is the
  * lower weighted median by the textbook definition: the smallest
  * value v with cum_weight(≤ v) ≥ W/2.
  *
  * Determinism: weights are exact integers (quantities are integral
  * doubles, cast long), the running weight sum is exact, and the
  * selection predicate `2·cumw ≥ W` is pure integer arithmetic — no
  * interpolation, no division, hash-exact by construction. Value ties
  * tiebreak by ordering on (value) with rows of equal value merged by
  * the cumulative sum anyway (the predicate picks the same v whatever
  * the intra-tie order).
  *
  * Scale shape: one (group, value) pre-aggregate compresses the fact
  * to distinct-value CELLS (the q109 discipline — the only fact-sized
  * exchange), the running sum rides a window over the cell frame
  * sorted within each group, and one row per group survives the
  * argmin filter. No per-group array ever exists, so this IS the
  * 100 TB path (unlike the q125/q151 collect_list fence passes).
  */
object WeightedMedian {

  /** Lower weighted median of `valCol` weighted by integral
    * `weightCol`, per `keyCol`. Factored so the spec can pin the
    * textbook worked example and the heavy-single-value case.
    */
  def weightedMedian(df: DataFrame, keyCol: String, valCol: String,
      weightCol: String): DataFrame = {
    val cells = df
      .groupBy(col(keyCol), col(valCol).as("graft_v"))
      .agg(sum(col(weightCol).cast("long")).as("graft_w"))
    val byKey = Window.partitionBy(col(keyCol))
    val run = byKey.orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("graft_cumw", sum(col("graft_w")).over(run))
      .withColumn("graft_tot", sum(col("graft_w")).over(byKey))
      .filter(col("graft_cumw") * 2 >= col("graft_tot"))
      .withColumn("graft_rn",
        row_number().over(byKey.orderBy(col("graft_v"))))
      .filter(col("graft_rn") === 1)
      .select(
        col(keyCol),
        col("graft_v").as("w_median"),
        col("graft_tot").as("total_weight"),
        col("graft_cumw").as("cum_weight_at_median"))
  }

  val q156 = Q.of(
    "q156_weighted_median",
    """WITH cells AS (
      |  SELECT l_returnflag, l_extendedprice AS v,
      |    SUM(CAST(l_quantity AS BIGINT)) AS w
      |  FROM lineitem GROUP BY 1, 2
      |), run AS (
      |  SELECT l_returnflag, v, w,
      |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      |  FROM cells
      |), hit AS (
      |  SELECT l_returnflag, v, cumw, tot,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn
      |  FROM run WHERE cumw * 2 >= tot
      |)
      |SELECT l_returnflag,
      |  v AS w_median,
      |  CAST(tot AS BIGINT) AS total_weight,
      |  CAST(cumw AS BIGINT) AS cum_weight_at_median
      |FROM hit WHERE rn = 1
      |ORDER BY l_returnflag""".stripMargin) { t =>
    weightedMedian(t.lineitem, "l_returnflag", "l_extendedprice", "l_quantity")
      .orderBy(col("l_returnflag"))
  }

  def all: Seq[Q] = Seq(q156)
}
