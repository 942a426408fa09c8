package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** q106: one-scan COLUMN PROFILING — the `ANALYZE TABLE` / data-
  * catalog statistics pass every ETL platform runs on a freshly
  * landed table: per-column null count, exact distinct cardinality,
  * min and max, plus the table row base, reported long-form as one
  * row per column.
  *
  * Scale shape: ALL columns profile in ONE scan — every metric is an
  * aggregate over the same pass (q93's contract, pinned the same
  * way: exactly one FileSourceScanExec in the plan). The exact form
  * does NOT hand multi-column `count_distinct` to Catalyst's
  * rewrite: that plans Expand + an aggregate that also carries the
  * string min/max — and a string aggregation buffer is not
  * UnsafeRow-mutable, so the whole k×-expanded fact falls back to
  * SortAggregate and gets FULLY SORTED (measured 6.9 s vs 0.6 s at
  * sf0.1; at 100 TB it's a sort of 5× the table). Instead the fact is
  * stacked to (gid, typed value) rows and hash-reduced to the
  * per-column distinct-value CELL frame first — the count-only buffer
  * keeps the fact-sized stage a codegen'd HashAggregate — and every
  * metric (distinct = non-null cells, nulls/rows = cnt sums, typed
  * min/max) folds over cells in a global aggregate whose string
  * buffers cost nothing (no grouping keys → no sort, tiny input).
  * At 100 TB the documented swap is `approx_count_distinct`, the q25
  * HLL tier (`exact = false`): no row multiplication at all, one
  * direct fold over the fact. Min/max are emitted as strings so
  * heterogeneous column types share one report schema — only
  * string-stable types are profiled (integers, dates, strings;
  * doubles are excluded because float→string formatting is not
  * cross-engine-stable, the q68 rule).
  *
  * The oracle takes the naive one-subquery-per-column form — two
  * structurally different evaluations on the two sides of the hash
  * compare (the q93 pattern).
  */
object Profile {

  /** One profiled column: report name + the (already cast-stable)
    * column expression.
    */
  final case class ColSpec(name: String, expr: Column)

  /** One-scan profile: per spec — nulls, distinct, min/max as
    * strings — unpivoted to (col_name, n_nulls, n_distinct, min_str,
    * max_str) rows plus the shared row base. `exact = false` swaps
    * the multi-column exact `count_distinct` (one Expand, k-way row
    * multiplication into the aggregate) for `approx_count_distinct`
    * (the q25 HLL tier): Expand-free, still one scan — the 100 TB
    * default, pinned plan-shape-for-plan-shape in ProfilingSpec.
    */
  def profile(df: DataFrame, specs: Seq[ColSpec], exact: Boolean = true): DataFrame = {
    val one = if (exact) exactCounters(df, specs) else approxCounters(df, specs)
    val stackArgs = specs.map(s =>
      s"'${s.name}', graft_nu_${s.name}, graft_d_${s.name}, " +
        s"graft_mn_${s.name}, graft_mx_${s.name}").mkString(", ")
    one.select(
      expr(s"stack(${specs.length}, $stackArgs) as " +
        "(col_name, n_nulls, n_distinct, min_str, max_str)"),
      col("graft_n_rows").as("n_rows"))
  }

  /** Exact metrics via the distinct-value cell frame (see Scaladoc):
    * fact → stack to one (gid, typed value) row per profiled column →
    * hash-reduce to (gid, value, cnt) cells (count-only buffer, stays
    * HashAggregate) → global fold where the string min/max buffers
    * see only the compressed frame.
    */
  private def exactCounters(df: DataFrame, specs: Seq[ColSpec]): DataFrame = {
    // stack row i: (gid=i, null, …, specs(i).expr, …, null) — typed
    // nulls via when(false, e) so each output column keeps its type
    val stackArgs = specs.zipWithIndex.flatMap { case (_, i) =>
      lit(i) +: specs.zipWithIndex.map { case (s, j) =>
        if (i == j) s.expr else when(lit(false), s.expr)
      }
    }
    val valNames = specs.indices.map(i => s"graft_v$i")
    val gidded = df.select(
      stack((lit(specs.length) +: stackArgs): _*).as("graft_gid" +: valNames))
    val cells = gidded
      .groupBy((col("graft_gid") +: valNames.map(col)): _*)
      .agg(count(lit(1)).as("graft_cnt"))
    val counters =
      coalesce(sum(when(col("graft_gid") === 0, col("graft_cnt"))), lit(0L))
        .as("graft_n_rows") +:
      specs.zipWithIndex.flatMap { case (s, i) =>
        val v = col(s"graft_v$i")
        val mine = col("graft_gid") === i
        Seq(
          coalesce(sum(when(mine && v.isNull, col("graft_cnt"))), lit(0L))
            .as(s"graft_nu_${s.name}"),
          coalesce(sum(when(mine && v.isNotNull, 1L)), lit(0L))
            .as(s"graft_d_${s.name}"),
          min(when(mine, v)).cast("string").as(s"graft_mn_${s.name}"),
          max(when(mine, v)).cast("string").as(s"graft_mx_${s.name}"))
      }
    cells.agg(counters.head, counters.tail: _*)
  }

  /** Approx metrics: one direct fold over the fact — HLL distinct
    * buffers are fixed-width, the string min/max buffers ride a
    * grouping-key-free aggregate (no sort), no row multiplication.
    */
  private def approxCounters(df: DataFrame, specs: Seq[ColSpec]): DataFrame = {
    val counters = count(lit(1)).as("graft_n_rows") +: specs.flatMap { s =>
      Seq(
        sum(when(s.expr.isNull, 1L).otherwise(0L)).as(s"graft_nu_${s.name}"),
        approx_count_distinct(s.expr).as(s"graft_d_${s.name}"),
        min(s.expr).cast("string").as(s"graft_mn_${s.name}"),
        max(s.expr).cast("string").as(s"graft_mx_${s.name}"))
    }
    df.agg(counters.head, counters.tail: _*)
  }

  private def lineitemSpecs: Seq[ColSpec] = Seq(
    ColSpec("l_orderkey", col("l_orderkey")),
    ColSpec("l_suppkey", col("l_suppkey")),
    ColSpec("l_returnflag", col("l_returnflag")),
    ColSpec("l_shipdate", col("l_shipdate").cast("date")))

  val q106 = Q.of(
    "q106_column_profile",
    """WITH base AS (SELECT COUNT(*) AS n_rows FROM lineitem)
      |SELECT p.col_name, p.n_nulls, p.n_distinct, p.min_str, p.max_str,
      |  base.n_rows
      |FROM (
      |  SELECT 'l_orderkey' AS col_name,
      |    (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS n_nulls,
      |    (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_distinct,
      |    (SELECT CAST(MIN(l_orderkey) AS VARCHAR) FROM lineitem) AS min_str,
      |    (SELECT CAST(MAX(l_orderkey) AS VARCHAR) FROM lineitem) AS max_str
      |  UNION ALL SELECT 'l_suppkey',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NULL),
      |    (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem),
      |    (SELECT CAST(MIN(l_suppkey) AS VARCHAR) FROM lineitem),
      |    (SELECT CAST(MAX(l_suppkey) AS VARCHAR) FROM lineitem)
      |  UNION ALL SELECT 'l_returnflag',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_returnflag IS NULL),
      |    (SELECT COUNT(DISTINCT l_returnflag) FROM lineitem),
      |    (SELECT MIN(l_returnflag) FROM lineitem),
      |    (SELECT MAX(l_returnflag) FROM lineitem)
      |  UNION ALL SELECT 'l_shipdate',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL),
      |    (SELECT COUNT(DISTINCT CAST(l_shipdate AS DATE)) FROM lineitem),
      |    (SELECT CAST(MIN(CAST(l_shipdate AS DATE)) AS VARCHAR) FROM lineitem),
      |    (SELECT CAST(MAX(CAST(l_shipdate AS DATE)) AS VARCHAR) FROM lineitem)
      |) p, base
      |ORDER BY col_name""".stripMargin) { t =>
    profile(t.lineitem, lineitemSpecs).orderBy(col("col_name"))
  }

  /** q109: EXACT distributed quantiles + IQR outlier fences over
    * DISTINCT-VALUE-COMPRESSED cells — the scale answer to the
    * sorted-array percentile (q10/q58 collect a per-group array:
    * exact, but the array is GROUP-sized; `approx_percentile` (q10b)
    * is one-pass but approximate). For a bounded-domain metric
    * (integer-valued scores, counts, bucketed amounts — here
    * `floor(value)` over events), the exact answer needs only the
    * (group, value, count) CELL frame: |domain| rows per group
    * regardless of fact size, so a 100 TB fact compresses to a few
    * hundred cells per group before anything is sorted.
    *
    * Mechanics: one hash aggregate to cells (the only fact-sized
    * exchange), a keyed cumulative-count window over the cell frame
    * (tiny), then quantile_cont semantics by integer arithmetic: for
    * p = k/4 the 0-indexed rank is r4 = k·(n−1) QUARTERS, the
    * bracketing values are the cells whose cumulative range covers
    * r4 div 4 and r4 div 4 + 1, and the interpolation weight is
    * (r4 mod 4)/4 — an exact binary fraction, so every interpolated
    * quantile, fence, and comparison below is EXACT in IEEE double
    * and the oracle can use DuckDB's native `quantile_cont`
    * evaluation (engine-native on both sides, no mirrored formula).
    * Outlier counting is a SECOND conditional aggregate over the same
    * cell frame with the one-row-per-group fence frame broadcast back
    * onto it — no per-group array is ever materialized, so per-group
    * state stays O(1) even when the value domain grows (the r8
    * collect_list histogram was bounded only by a domain assumption;
    * this shape needs none). The cells exchange is structurally
    * identical in both branches, so ReuseExchange dedupes the
    * fact-sized work to one scan + one partial aggregate.
    */
  val q109 = Q.of(
    "q109_quantile_compressed",
    """WITH v AS (
      |  SELECT event_type, CAST(floor(value) AS BIGINT) AS val
      |  FROM events WHERE value IS NOT NULL
      |), q AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    quantile_cont(val, 0.25) AS q1,
      |    quantile_cont(val, 0.5) AS median,
      |    quantile_cont(val, 0.75) AS q3
      |  FROM v GROUP BY event_type
      |)
      |SELECT event_type, n, q1, median, q3,
      |  q1 - 1.5 * (q3 - q1) AS lo_fence,
      |  q3 + 1.5 * (q3 - q1) AS hi_fence,
      |  (SELECT COUNT(*) FROM v
      |   WHERE v.event_type = q.event_type
      |     AND (val < q1 - 1.5 * (q3 - q1) OR val > q3 + 1.5 * (q3 - q1)))
      |    AS n_outliers
      |FROM q
      |ORDER BY event_type""".stripMargin) { t =>
    quantileFences(
      t.events.filter(col("value").isNotNull)
        .select(col("event_type"), floor(col("value")).cast("long").as("val")),
      "event_type", "val")
      .orderBy(col("event_type"))
  }

  /** Exact p25/p50/p75 + IQR fences + outlier counts per `groupCol`
    * over bounded-domain long `valCol` — see q109. Factored so the
    * spec can pin hand-computable distributions and the fence
    * counter on crafted skew.
    */
  def quantileFences(v: DataFrame, groupCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = v.groupBy(col(groupCol), col(valCol)).agg(count(lit(1)).as("cnt"))
    val wOrd = Window.partitionBy(groupCol).orderBy(valCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    var cum = cells
      .withColumn("cum_end", sum(col("cnt")).over(wOrd))
      .withColumn("cum_start", col("cum_end") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(wAll))
    for (k <- 1 to 3) {
      cum = cum
        .withColumn(s"idx$k", expr(s"($k * (n - 1)) div 4"))
        .withColumn(s"rem$k", expr(s"($k * (n - 1)) % 4"))
    }
    def bracket(k: Int): Seq[Column] = Seq(
      max(when(col("cum_start") <= col(s"idx$k") && col(s"idx$k") < col("cum_end"),
        col(valCol))).as(s"lo$k"),
      max(when(col("cum_start") <= col(s"idx$k") + 1 && col(s"idx$k") + 1 < col("cum_end"),
        col(valCol))).as(s"hi$k"),
      max(col(s"rem$k")).as(s"rm$k"))
    val aggd = cum.groupBy(col(groupCol)).agg(
      max(col("n")).as("n"),
      (bracket(1) ++ bracket(2) ++ bracket(3)): _*)
    // rem == 0 → the quantile IS lo (hi may not exist when the rank
    // is the group's last index — the n < 5 fixture edge)
    def interp(k: Int): Column = when(col(s"rm$k") === 0, col(s"lo$k").cast("double"))
      .otherwise(col(s"lo$k").cast("double") +
        (col(s"hi$k") - col(s"lo$k")).cast("double") * (col(s"rm$k").cast("double") / 4.0))
    val fences = aggd
      .withColumn("q1", interp(1))
      .withColumn("median", interp(2))
      .withColumn("q3", interp(3))
      .withColumn("lo_fence", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi_fence", col("q3") + lit(1.5) * (col("q3") - col("q1")))
      .select(col(groupCol), col("n"), col("q1"), col("median"), col("q3"),
        col("lo_fence"), col("hi_fence"))
    // One row per group → broadcast back onto the cell frame; the
    // outlier count is a conditional re-aggregation, never an array.
    val outliers = cells
      .join(broadcast(fences.select(col(groupCol), col("lo_fence"), col("hi_fence"))),
        Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(sum(when(
        col(valCol).cast("double") < col("lo_fence") ||
          col(valCol).cast("double") > col("hi_fence"),
        col("cnt")).otherwise(0L)).as("n_outliers"))
    fences.join(outliers, Seq(groupCol))
      .select(col(groupCol), col("n"), col("q1"), col("median"), col("q3"),
        col("lo_fence"), col("hi_fence"), col("n_outliers"))
  }

  def all: Seq[Q] = Seq(q106, q109)
}
