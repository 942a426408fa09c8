package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q195: incremental maintenance of a JOIN-aggregate view — the
  * missing leg between q96 (aggregate-only incremental state) and
  * q94 (key-level CDC upsert): the maintained object here is a view
  * DEFINED THROUGH A JOIN, per-customer revenue over
  * orders ⋈ lineitem, and the maintenance step is delta algebra —
  * V(base ∪ Δ) = V(base) ⊕ V(Δ) — valid because every aggregate the
  * view carries is a commutative monoid over the join output
  * (decimal sums, counts, min/max; classic incremental view
  * maintenance, Gupta & Mumick 1995, public). The fact delta is the
  * l_shipdate ≥ split slice (what a daily load appends); the oracle
  * recomputes the view from scratch over the full fact — the merge
  * MUST be indistinguishable from the recompute, including customers
  * who exist only in the delta.
  *
  * The deliberately-excluded aggregate is the lesson: COUNT(DISTINCT
  * l_orderkey) is NOT mergeable across base/delta (an order's lines
  * straddle the split), so the view carries only monoid state —
  * exactly the discipline q100 solves with HLL sketches when a
  * distinct count is genuinely needed.
  *
  * Determinism: revenue terms l_extendedprice·(1−l_discount) are
  * D20_6-quantized per element; base-sum ⊕ delta-sum equals the
  * full sum EXACTLY (decimal addition is associative — this is the
  * whole point of the §6 routing; a double view state would drift
  * from the recompute by an ULP and fail the hash gate).
  *
  * Scale shape: at 100 TB the base view is a MATERIALIZED table and
  * only V(Δ) touches new data — here both sides are computed to keep
  * the query self-contained, but the merge is the real operator:
  * delta ⋈ broadcast-able dim slice, partial-agg below the shuffle,
  * one full-outer merge on the view key, coalesce-⊕ per column.
  */
object IvmJoin {

  private val Split = "1997-06-01"

  /** ⊕-merge of two view states keyed by `cust` with monoid columns
    * (revenue D20_6, n_items, first_ship, last_ship). Factored so the
    * spec can pin merge ≡ recompute on hand-built frames, including
    * keys present on one side only.
    */
  def mergeViews(base: DataFrame, delta: DataFrame): DataFrame = {
    val b = base.select(col("cust").as("cust_b"), col("graft_rev").as("rev_b"),
      col("n_items").as("ni_b"), col("first_ship").as("fs_b"),
      col("last_ship").as("ls_b"))
    val d = delta.select(col("cust").as("cust_d"), col("graft_rev").as("rev_d"),
      col("n_items").as("ni_d"), col("first_ship").as("fs_d"),
      col("last_ship").as("ls_d"))
    b.join(d, col("cust_b") === col("cust_d"), "full_outer")
      .select(
        coalesce(col("cust_b"), col("cust_d")).as("cust"),
        (coalesce(col("rev_b"), lit(0).cast(det.D20_6)) +
          coalesce(col("rev_d"), lit(0).cast(det.D20_6))).as("graft_rev"),
        (coalesce(col("ni_b"), lit(0L)) + coalesce(col("ni_d"), lit(0L)))
          .as("n_items"),
        least(col("fs_b"), col("fs_d")).as("first_ship"),
        greatest(col("ls_b"), col("ls_d")).as("last_ship"))
  }

  /** Per-customer join-view state over one fact slice. */
  def viewOf(orders: DataFrame, fact: DataFrame): DataFrame =
    fact
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("cust"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(det.D20_6)).as("graft_rev"),
        count(lit(1)).as("n_items"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))

  val q195 = Q.of(
    "q195_ivm_join",
    s"""SELECT o_custkey AS cust,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,6)))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items,
      |  MIN(l_shipdate) AS first_ship,
      |  MAX(l_shipdate) AS last_ship
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_custkey
      |ORDER BY cust""".stripMargin) { t =>
    val fact = t.lineitem.select(col("l_orderkey"), col("l_extendedprice"),
      col("l_discount"), col("l_shipdate"))
    val base = fact.filter(col("l_shipdate") < lit(Split).cast("timestamp"))
    val delta = fact.filter(col("l_shipdate") >= lit(Split).cast("timestamp"))
    mergeViews(viewOf(t.orders, base), viewOf(t.orders, delta))
      .select(col("cust"), col("graft_rev").cast("double").as("revenue"),
        col("n_items"), col("first_ship"), col("last_ship"))
      .orderBy(col("cust"))
  }

  def all: Seq[Q] = Seq(q195)
}
