package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det
import graft.operators.PrefixSum

/** q155: RFM SEGMENTATION — the classic recency/frequency/monetary
  * customer-value quartile grid (Hughes 1994, public; the
  * segmentation the reference's LTV/churn analyses feed): per
  * customer R = days since last order, F = order count, M = total
  * spend, each scored into quartiles by `ntile(4)`, reported as the
  * segment-cell rollup (counts + per-cell means) a CRM actually
  * consumes.
  *
  * Determinism: ntile needs a TOTAL order or the quartile boundary
  * inside a tie run is engine-private — every ranking tiebreaks on
  * custkey (the q124 lesson applied to ranking); R scores DESCENDING
  * (recent = high) while F/M score ascending. Spark and DuckDB share
  * the ntile definition (first buckets take the remainder). Cell
  * means are exact integer/decimal sums over exact counts, one IEEE
  * division each, no rounding.
  *
  * Scale shape: fact → one per-customer rollup (map-side combined,
  * one exchange); the three ntiles are GLOBAL total orders of the
  * customer frame, each riding the distributed two-phase prefix scan
  * (never a one-task window); the fully-exact alternative trade is
  * approx_percentile quartile FENCES broadcast back (q125's sketch
  * path; same output grain, one pass, approximate edges). The
  * observation anchor is a one-row scalar cross-joined broadcast
  * (q142 discipline). Segment rollup is bounded by 4³.
  */
object Rfm {

  /** RFM quartile cells over per-subject (recency, frequency,
    * monetary) rows. Factored so the spec can pin quartile edges and
    * the tiebreak determinism.
    *
    * Each quartile is NTILE(4) over a global total order — derived
    * via [[PrefixSum.globalNtile]] (range-partition + bounded driver
    * offsets + exact int64 rank→bucket map), NOT a bare
    * `Window.orderBy`: the subject frame grows with the data, and an
    * empty-partition window collapses it into ONE WindowExec task.
    * Three orders = three prefix scans — the honest cost of three
    * exact quartile grids; the sketch swap (approx_percentile fences
    * broadcast back, q125's path) trades exactness for one pass.
    */
  def cells(perCust: DataFrame, idCol: String): DataFrame = {
    def quartile(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
        out: String): DataFrame =
      PrefixSum.globalNtile(df, order, buckets = 4, outCol = out,
        numPartitions = 8)
    val scored =
      quartile(
        quartile(
          quartile(perCust,
            Seq(col("recency").desc, col(idCol)), "r_score"),
          Seq(col("frequency"), col(idCol)), "f_score"),
        Seq(col("monetary"), col(idCol)), "m_score")
    scored
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(
        count(lit(1)).as("n_customers"),
        (sum(col("recency")).cast("double") / count(lit(1))).as("avg_recency"),
        (sum(col("frequency")).cast("double") / count(lit(1))).as("avg_frequency"),
        (det.dsumw(col("monetary")) / count(lit(1))).as("avg_monetary"))
  }

  val q155 = Q.of(
    "q155_rfm_segments",
    """WITH obs AS (
      |  SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor FROM orders
      |), per_cust AS (
      |  SELECT o_custkey,
      |    datediff('day', CAST(MAX(o_orderdate) AS DATE), anchor) AS recency,
      |    COUNT(*) AS frequency,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS monetary
      |  FROM orders, obs GROUP BY o_custkey, anchor
      |), scored AS (
      |  SELECT o_custkey, recency, frequency, monetary,
      |    ntile(4) OVER (ORDER BY recency DESC, o_custkey) AS r_score,
      |    ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
      |    ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_score
      |  FROM per_cust
      |)
      |SELECT r_score, f_score, m_score,
      |  CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(recency) AS DOUBLE) / COUNT(*) AS avg_recency,
      |  CAST(SUM(frequency) AS DOUBLE) / COUNT(*) AS avg_frequency,
      |  CAST(SUM(CAST(monetary AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_monetary
      |FROM scored
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin) { t =>
    val anchor = t.orders.agg(to_date(max(col("o_orderdate"))).as("anchor"))
    val perCust = t.orders
      .crossJoin(broadcast(anchor))
      .groupBy(col("o_custkey"), col("anchor"))
      .agg(
        datediff(col("anchor"), to_date(max(col("o_orderdate")))).as("recency"),
        count(lit(1)).as("frequency"),
        det.dsumw(col("o_totalprice")).as("monetary"))
    cells(perCust, "o_custkey").orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  def all: Seq[Q] = Seq(q155)
}
