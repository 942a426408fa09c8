package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.det.dsum

/** q101: time-series GAP-FILL — the calendar-spine + forward-fill
  * operation every reporting ETL runs before charting or feature
  * extraction: a sparse per-(cohort, month) aggregate is completed to
  * a DENSE grid (every cohort × every month in the observed range,
  * absent cells explicit NULL) and a forward-fill carries each
  * cohort's last observed value across its gaps (`last(col,
  * ignoreNulls)` over a row-frame window — the LOCF imputation).
  *
  * Cohort = `l_partkey % 97`: a FIXED-cardinality grouping, so the
  * dense grid is 97 × |months| rows at EVERY SF (the view is bounded
  * by its grain, never by the fact) and sparse at small SF — real
  * gaps for the fill to cross, while the oracle checks the machinery
  * at every density.
  *
  * Scale shape (100 TB fact): the fact collapses to the sparse cell
  * aggregate FIRST (one exchange, map-side partials); the spine is
  * |cohorts| × |months| generated rows (`sequence` + two explodes —
  * never a fact-sized join input); the completion join and the
  * forward-fill window both ride the cohort key. Month bounds land as
  * plan-time literals from one footer-stats min/max pass (the q98
  * pattern). Everything downstream of the first aggregate is
  * view-sized.
  *
  * Determinism: cell values are §6(a) decimal sums cast double;
  * the fill copies those exact doubles; months are date-truncated
  * dates; no floats are produced by the fill itself. DuckDB's
  * `last_value(x IGNORE NULLS)` over the same ROWS frame mirrors
  * Spark's `last(x, ignoreNulls=true)` exactly.
  */
object GapFill {

  val q101 = Q.of(
    "q101_gapfill",
    """WITH cells AS (
      |  SELECT l_partkey % 97 AS cohort,
      |    CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS qty
      |  FROM lineitem GROUP BY 1, 2
      |), bounds AS (
      |  SELECT CAST(min(date_trunc('month', l_shipdate)) AS DATE) AS mn,
      |         CAST(max(date_trunc('month', l_shipdate)) AS DATE) AS mx
      |  FROM lineitem
      |), spine AS (
      |  SELECT c.cohort, CAST(gs.g AS DATE) AS month
      |  FROM (SELECT DISTINCT cohort FROM cells) c,
      |       (SELECT unnest(generate_series(
      |          (SELECT mn FROM bounds), (SELECT mx FROM bounds),
      |          INTERVAL 1 MONTH)) AS g) gs
      |)
      |SELECT s.cohort, s.month, c.qty,
      |  last_value(c.qty IGNORE NULLS) OVER (
      |    PARTITION BY s.cohort ORDER BY s.month
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS qty_filled
      |FROM spine s LEFT JOIN cells c
      |  ON c.cohort = s.cohort AND c.month = s.month
      |ORDER BY s.cohort, s.month""".stripMargin) { t =>
    val li = t.lineitem
    val cells = li.groupBy(
        (col("l_partkey") % 97).as("cohort"),
        date_trunc("month", col("l_shipdate")).cast("date").as("month"))
      .agg(dsum(col("l_quantity")).as("qty"))
    // month bounds as plan-time literals (one footer-stats pass)
    val b = li.agg(
      date_trunc("month", min("l_shipdate")).cast("date").as("mn"),
      date_trunc("month", max("l_shipdate")).cast("date").as("mx")).head()
    fill(cells, b.getAs[java.sql.Date]("mn"), b.getAs[java.sql.Date]("mx"))
      .orderBy("cohort", "month")
  }

  /** Complete (cohort, month, qty) cells to the dense grid over
    * [mn, mx] months and forward-fill per cohort — factored so EtlSpec
    * can drive crafted gap shapes (leading gap stays NULL, interior
    * gap carries the last value, value changes reset the fill).
    */
  def fill(cells: DataFrame, mn: java.sql.Date, mx: java.sql.Date): DataFrame = {
    val months = explode(sequence(
      lit(mn).cast("timestamp"), lit(mx).cast("timestamp"),
      expr("INTERVAL 1 MONTH"))).as("m")
    val spine = cells.select(col("cohort")).distinct()
      .select(col("cohort"), months)
      .select(col("cohort"), col("m").cast("date").as("month"))
    val w = Window.partitionBy("cohort").orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(cells.withColumnRenamed("cohort", "c2")
        .withColumnRenamed("month", "m2"),
        col("cohort") === col("c2") && col("month") === col("m2"), "left")
      .select(col("cohort"), col("month"), col("qty"),
        last(col("qty"), ignoreNulls = true).over(w).as("qty_filled"))
  }

  def all: Seq[Q] = Seq(q101)
}
