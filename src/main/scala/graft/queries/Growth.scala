package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q149: PERIOD-OVER-PERIOD growth — month-over-month and
  * year-over-year revenue deltas, the headline KPI spelling every
  * finance/exec dashboard leads with (and the reference's seasonal /
  * churn composition analyses imply): monthly revenue plus
  * MoM = rev/lag(rev,1) − 1 and YoY = rev/lag(rev,12) − 1, with
  * explicit NULL for months without a comparison period (no silent
  * zero — a fake 0 % growth in month one misreads).
  *
  * Scale shape: ONE map-side-combined monthly rollup (output bounded
  * by the calendar), then both lags in one window pass over that
  * bounded frame. Revenue is a §6 decimal-routed sum; the growth
  * ratios are single IEEE divisions of those sums, rounded 4 (the
  * q11 rule for values that pass through big-decimal→double
  * conversion).
  */
object Growth {

  /** MoM / YoY growth over a (periodCol, value) monthly series.
    * Factored so the spec can pin exact doubling (+1.0), halving
    * (−0.5), and the missing-period NULLs.
    */
  def growth(monthly: DataFrame, monthCol: String, valCol: String): DataFrame = {
    val w = Window.orderBy(col(monthCol)) // bounded calendar frame
    monthly
      .withColumn("mom",
        round(col(valCol) / lag(col(valCol), 1).over(w) - 1.0, 4))
      .withColumn("yoy",
        round(col(valCol) / lag(col(valCol), 12).over(w) - 1.0, 4))
  }

  val q149 = Q.of(
    "q149_growth_mom_yoy",
    """WITH monthly AS (
      |  SELECT date_trunc('month', o_orderdate) AS month,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |  FROM orders GROUP BY 1
      |)
      |SELECT CAST(month AS DATE) AS month, n_orders, revenue,
      |  round(revenue / lag(revenue, 1) OVER (ORDER BY month) - 1.0, 4) AS mom,
      |  round(revenue / lag(revenue, 12) OVER (ORDER BY month) - 1.0, 4) AS yoy
      |FROM monthly
      |ORDER BY month""".stripMargin) { t =>
    growth(
      t.orders
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          det.dsumw(col("o_totalprice")).as("revenue")),
      "month", "revenue")
      .orderBy(col("month"))
  }

  def all: Seq[Q] = Seq(q149)
}
