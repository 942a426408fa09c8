package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.PrefixSum

/** q177: EQUI-DEPTH HISTOGRAM — exact K-bucket boundaries for the
  * order-value distribution: bucket i's upper fence is the SMALLEST
  * value whose cumulative count reaches ⌈i·n/K⌉. This is the
  * histogram engines actually keep for selectivity estimation (q147's
  * equi-WIDTH bins chop the RANGE and leave skewed masses; equi-depth
  * chops the MASS so every bucket carries ~n/K rows — the optimizer-
  * statistics standard, e.g. the classic height-balanced histogram
  * literature, public), and the exact counterpart of q10b's
  * approx-quantile sketch.
  *
  * All-integer determinism: thresholds thr_i = ⌈i·n/K⌉ are integer
  * arithmetic; the value domain is floor-dollar granularity (bounded
  * by the PRICE RANGE, not the row count) so per-value counts are
  * exact integers and the boundary choice is an integer comparison —
  * nothing floats anywhere. Ties are impossible by construction
  * (cum is strictly increasing across distinct values).
  *
  * The scale move: each cumulative cell KNOWS which thresholds land
  * on it — thr_i ∈ (cum_prev, cum] ⟺ cum_prev·K < i·n ≤ cum·K ⟺
  * i ∈ [cum_prev·K div n + 1, cum·K div n] — so boundaries come from
  * a sequence-explode over that integer interval: NO spine join, no
  * broadcast-nested-loop range probe, and at most K rows survive
  * the explode across the whole frame. One map-side-combined
  * per-value aggregate, one distributed two-phase prefix scan
  * ([[graft.operators.PrefixSum.orderedRunningSum]]) over the cell
  * frame — which TRACKS the order count until it saturates at the
  * price-domain width, so it is NOT whitelist-bounded (the round-13
  * re-audit) — one zero-join projection.
  */
object EquiDepth {

  private val K = 8

  /** Exact equi-depth boundaries of integer column `v` in `df` into
    * `k` buckets: (bucket, upper value, cumulative count at it,
    * threshold it satisfies). Factored so the spec can pin a
    * hand-computed skewed distribution (one heavy value swallowing
    * several thresholds), the uniform case, and n < k degeneracy.
    */
  def boundaries(df: DataFrame, vCol: String, k: Int): DataFrame = {
    val cells = df.select(col(vCol).as("graft_v"))
      .groupBy(col("graft_v"))
      .agg(count(lit(1)).as("graft_c"))
    // the floor-dollar alphabet tracks the order count until it
    // saturates at the PRICE-DOMAIN width (measured 1.5k/15k/130k
    // distinct at sf0.001/0.01/0.1, still growing at sf0.1) — so the
    // cumsum rides the distributed two-phase prefix scan, never a
    // single-task global window; n is a one-row broadcast (max of a
    // monotone cumsum over the same cached frame)
    val cum = PrefixSum.orderedRunningSum(
      cells, orderBy = Seq(col("graft_v")),
      value = col("graft_c"), outCol = "graft_cum", numPartitions = 8)
    val tot = cum.agg(coalesce(max(col("graft_cum")), lit(0L)).as("graft_n"))
    cum.crossJoin(broadcast(tot))
      // integer div, NOT `/` + cast: Spark's bigint `/` is double
      // division and a quotient 1 ulp above an integer would cross
      // the floor boundary (the q160 rule)
      .withColumn("graft_lo",
        expr(s"(graft_cum - graft_c) * $k div graft_n") + 1)
      .withColumn("graft_hi", expr(s"graft_cum * $k div graft_n"))
      .filter(col("graft_lo") <= col("graft_hi"))
      .select(
        explode(sequence(col("graft_lo"), least(col("graft_hi"), lit(k.toLong)))).as("bucket"),
        col("graft_v").as("upper_value"),
        col("graft_cum").as("cum_count"),
        col("graft_n"))
      .filter(col("bucket") <= k)
      .select(
        col("bucket"),
        col("upper_value"),
        col("cum_count"),
        expr(s"(bucket * graft_n + ${k - 1}) div $k").as("threshold"))
  }

  val q177 = Q.of(
    "q177_equi_depth_hist",
    s"""WITH cells AS (
      |  SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS v, COUNT(*) AS c
      |  FROM orders GROUP BY 1
      |), cum AS (
      |  SELECT v, c,
      |    SUM(c) OVER (ORDER BY v) AS cum,
      |    SUM(c) OVER () AS n
      |  FROM cells
      |), spans AS (
      |  SELECT v, cum, n,
      |    (cum - c) * $K // n + 1 AS lo,
      |    cum * $K // n AS hi
      |  FROM cum
      |)
      |SELECT CAST(i.i AS BIGINT) AS bucket,
      |  v AS upper_value,
      |  CAST(cum AS BIGINT) AS cum_count,
      |  CAST((i.i * n + ${K - 1}) // $K AS BIGINT) AS threshold
      |FROM spans
      |JOIN (SELECT UNNEST(generate_series(1, $K)) AS i) i
      |  ON i.i BETWEEN spans.lo AND spans.hi
      |WHERE i.i <= $K
      |ORDER BY bucket""".stripMargin) { t =>
    boundaries(
      t.orders.select(floor(col("o_totalprice")).cast("long").as("v")),
      "v", K)
      .orderBy(col("bucket"))
  }

  def all: Seq[Q] = Seq(q177)
}
