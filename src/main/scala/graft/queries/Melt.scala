package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det.dsum

/** q140: UNPIVOT / MELT — the wide→long reshape that inverts q14's
  * pivot: a measures-as-columns aggregate row turned into one row per
  * (keys, measure, value). Every reporting layer needs BOTH
  * directions (pivot to present, melt to feed a long-form metric
  * store / chart library / generic quality-rule engine), and q93/q106
  * already use the raw `stack` expression internally — this is the
  * surface operator, via Spark's native `Dataset.unpivot` (Catalyst
  * `Expand` under the hood, same machinery as rollup).
  *
  * Scale shape: the melt runs AFTER the aggregation, over the bounded
  * (returnflag × linestatus) frame — Expand multiplies rows by the
  * measure count, so melting the FACT would be a 4× write
  * amplification; melting the rollup is free. The one fact-sized
  * exchange is the map-side-combined group aggregate itself.
  * Measures are §6 decimal-routed sums cast to a COMMON double type
  * (unpivot requires one value type — the long count is cast too,
  * exactly representable).
  *
  * Reference twin: the wide engagement/seasonal pivots
  * (pyspark/User Engagement Funnel Analysis.py:44) read back into a
  * long metric feed.
  */
object Melt {

  /** Wide per-(flag, status) measure frame melted to long form.
    * Factored so the spec can pin the exact (measure → value) fiber
    * of a hand-built wide row.
    */
  def melt(lineitem: DataFrame): DataFrame = {
    val wide = lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_discount")).as("sum_disc"),
        count(lit(1)).cast("double").as("n_rows"))
    wide.unpivot(
      Array(col("l_returnflag"), col("l_linestatus")),
      Array(col("sum_qty"), col("sum_price"), col("sum_disc"), col("n_rows")),
      "measure", "value")
  }

  val q140 = Q.of(
    "q140_unpivot",
    """WITH wide AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_price,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(20,6))) AS DOUBLE) AS sum_disc,
      |    CAST(COUNT(*) AS DOUBLE) AS n_rows
      |  FROM lineitem GROUP BY 1, 2
      |)
      |SELECT l_returnflag, l_linestatus, measure, value
      |FROM (UNPIVOT wide ON sum_qty, sum_price, sum_disc, n_rows
      |      INTO NAME measure VALUE value)
      |ORDER BY l_returnflag, l_linestatus, measure""".stripMargin) { t =>
    melt(t.lineitem)
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("measure"))
  }

  def all: Seq[Q] = Seq(q140)
}
