package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q217: DECILE LIFT / CUMULATIVE-GAINS table — the campaign-targeting
  * readout (direct-marketing / uplift canon, public) that q190's AUC
  * compresses into one number: rank by score, cut into ten deciles,
  * and report per decile the response rate, the LIFT vs the base
  * rate, and the cumulative share of all responders captured ("the
  * top 20% of the ranking holds 43% of responders" — the sentence a
  * targeting budget is set by). Completes the scorer-evaluation tier
  * (q190 AUC, q191 calibration, q175 NDCG, q189 MRR/MAP) with the
  * business-facing table.
  *
  * Determinism: deciles are the SQL-standard NTILE(10) split of a
  * TOTAL order (score DESC, id ASC — the §6(c) rule), derived in
  * exact int64 arithmetic from a distributed prefix rank; every
  * reported ratio rides
  * CLEARED DENOMINATORS — lift = (s_d·N)/(n_d·S), gain = cum_s/S —
  * exact int64 products cast to double for ONE IEEE division each,
  * so the table is hash-exact with no decimal lanes at all. Zero
  * responders overall guards lift/gain to NULL.
  *
  * Scale shape: the scored frame collapses to (decile, n, s) cells
  * via the two-phase prefix scan (range exchange + per-partition
  * windows — full parallelism, never a one-task global sort);
  * everything after is a 10-row fold.
  * The score here is the q191 discount-derived propensity, computed
  * in the scan.
  */
object LiftGain {

  /** Per-decile lift/gains over (id, score, label). Factored so the
    * spec can pin a perfect ranker (all responders in the top
    * deciles), a uniform ranker (lift 1 everywhere), and the exact
    * cleared-denominator arithmetic.
    *
    * The decile is NTILE(10) over the global (score DESC, id) total
    * order — but derived from a [[PrefixSum.orderedRunningSum]] rank
    * (range-partition + bounded driver offsets), NOT a bare
    * `Window.orderBy`: the scored frame is fact-sized and an
    * empty-partition window collapses it into ONE WindowExec task.
    * The rank→bucket map is the SQL-standard NTILE split in exact
    * int64 arithmetic: with q = n div 10, r = n mod 10, the first r
    * buckets hold q+1 rows — identical to the oracle's NTILE by
    * construction (LiftGainSpec pins the non-divisible case).
    */
  def liftTable(df: DataFrame, id: Column, score: Column,
      label: Column): DataFrame = {
    val base = df.select(id.as("graft_id"), score.as("graft_p"),
      label.cast("long").as("graft_y"))
    val ranked = graft.operators.PrefixSum.globalNtile(
      base, orderBy = Seq(col("graft_p").desc, col("graft_id").asc),
      buckets = 10, outCol = "decile", numPartitions = 8)
    val cells = ranked
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("graft_y")).as("graft_s"))
    val totals = cells.agg(
      sum(col("n")).cast("long").as("graft_nn"),
      sum(col("graft_s")).cast("long").as("graft_ss"))
    cells
      .join(broadcast(totals))
      .withColumn("graft_cum",
        sum(col("graft_s")).over(Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        col("decile").cast("long").as("decile"), col("n"),
        col("graft_s").cast("long").as("responders"),
        when(col("graft_ss") > 0,
          (col("graft_s") * col("graft_nn")).cast("double")
            / (col("n") * col("graft_ss")).cast("double")).as("lift"),
        when(col("graft_ss") > 0,
          col("graft_cum").cast("double") / col("graft_ss").cast("double"))
          .as("cum_gain"))
  }

  val q217 = Q.of(
    "q217_lift_gain",
    """WITH scored AS (
      |  SELECT l_orderkey * 10 + l_linenumber AS id,
      |    l_discount * (1.0 - l_tax) AS p,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem
      |), ranked AS (
      |  SELECT y, NTILE(10) OVER (ORDER BY p DESC, id ASC) AS decile
      |  FROM scored
      |), cells AS (
      |  SELECT decile, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS s
      |  FROM ranked GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS ss
      |  FROM cells
      |), cum AS (
      |  SELECT decile, n, s, nn, ss,
      |    SUM(s) OVER (ORDER BY decile
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS cs
      |  FROM cells CROSS JOIN tot
      |)
      |SELECT CAST(decile AS BIGINT) AS decile,
      |  CAST(n AS BIGINT) AS n,
      |  s AS responders,
      |  CASE WHEN ss > 0 THEN CAST(s * nn AS DOUBLE) / CAST(n * ss AS DOUBLE)
      |    END AS lift,
      |  CASE WHEN ss > 0 THEN CAST(cs AS DOUBLE) / CAST(ss AS DOUBLE)
      |    END AS cum_gain
      |FROM cum
      |ORDER BY decile""".stripMargin) { t =>
    liftTable(
      t.lineitem,
      col("l_orderkey") * 10 + col("l_linenumber"),
      col("l_discount") * (lit(1.0) - col("l_tax")),
      when(col("l_returnflag") === "R", 1L).otherwise(0L))
      .orderBy(col("decile"))
  }

  def all: Seq[Q] = Seq(q217)
}
