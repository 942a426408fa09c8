package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q204: POISSON BOOTSTRAP confidence intervals — the at-scale
  * bootstrap (resampling n rows WITH replacement needs global
  * coordination; giving each row an independent Poisson(1) weight
  * per replicate does not, and converges to the same distribution —
  * the large-scale bootstrap of the public streaming literature).
  * Per customer segment: the mean order value with a 95% CI that
  * assumes NOTHING about the distribution — the honest error bar
  * beside q192/q203's normal-theory tests.
  *
  * Replicate weights are DETERMINISTIC: the q79 md5-threshold
  * mechanism extended to an inverse-CDF ladder — u = md5(key‖':'‖r)
  * and weight = #{thresholds < u} over the Poisson(1) cumulative
  * probabilities quantized at 4 hex digits (5e2d/bc5b/eb71/fb24/
  * ff10/ffd9 = round(cum·65536); weights ≥ 6 truncated at P ≈
  * 6·10⁻⁴ — stated, not hidden). Same hex-string comparison both
  * engines ⇒ the whole resampling plan is cross-engine EXACT, and
  * reproducible across runs and cluster sizes.
  *
  * Determinism: per-(segment, replicate) Σw·x rides D20_6 (exact,
  * order-independent); replicate means are single IEEE divisions;
  * the CI bounds use det.dpercentile's explicit interpolation over
  * the SORTED 64-replicate mean array (bounded — the q200 rule).
  *
  * Scale shape: the fact is scanned ONCE and each row emits B = 64
  * (replicate, weight) pairs via a sequence explode — B× map work,
  * but the exchange carries only (segment × B) partial cells
  * (map-side combine collapses rows before the shuffle); the
  * percentile step tops out at B values per segment. At 100 TB the
  * B× projection cost is the price of assumption-free CIs; B is the
  * knob.
  */
object Bootstrap {

  private val B = 64

  // round(cumPoisson1(k) · 65536) as lowercase hex, k = 0..5
  private val Thresholds = Seq("5e2d", "bc5b", "eb71", "fb24", "ff10", "ffd9")

  /** md5 draw for (key, replicate) — computed ONCE per pair; the
    * ladder reads the materialized column so neither engine hashes
    * six times. */
  def drawOf(key: Column, rep: Column): Column =
    md5(concat(key.cast("string"), lit(":"), rep.cast("string")))

  /** Poisson(1) weight of a uniform hex draw via the threshold ladder. */
  def poissonWeight(u: Column): Column =
    Thresholds.foldLeft(lit(0)) { (acc, t) =>
      acc + when(u >= lit(t), 1).otherwise(0)
    }

  /** Per-key bootstrap mean CI of `x` over B replicates. Emits
    * (key, n, mean, lo95, hi95). Factored so the spec can pin weight
    * determinism, the ~unit mean of weights, CI coverage of the
    * point mean, and width shrinkage on a tighter distribution.
    */
  def bootstrapCi(df: DataFrame, key: Column, id: Column, x: Column,
      b: Int = B): DataFrame = {
    val base = df.select(key.as("key"), id.as("graft_id"), x.as("graft_x"))
    // the id→string cast runs ONCE per fact row (below the explode —
    // the Generate node keeps the projection from collapsing upward),
    // not once per (row × replicate); the replicate tag is a 64-entry
    // STRING literal array, so no per-row sequence materialization and
    // no per-exploded-row int→string cast feeds the md5 (guide §1.2
    // "per-task work" — md5 input bytes are unchanged, so the draws,
    // and the oracle, are identical)
    val reps = base
      .select(col("key"), col("graft_id").cast("string").as("graft_ids"),
        col("graft_x"))
      .select(col("key"), col("graft_ids"), col("graft_x"),
        explode(typedlit((1 to b).map(_.toString))).as("graft_r"))
      .withColumn("graft_u",
        md5(concat(col("graft_ids"), lit(":"), col("graft_r"))))
      .withColumn("graft_w", poissonWeight(col("graft_u")))
      .groupBy(col("key"), col("graft_r"))
      .agg(
        sum(col("graft_w").cast("long")).as("graft_wn"),
        sum((col("graft_w").cast("double") * col("graft_x")).cast(det.D20_6))
          .as("graft_wx"))
      .filter(col("graft_wn") > 0)
      .select(col("key"), col("graft_r"),
        (col("graft_wx").cast("double") / col("graft_wn").cast("double"))
          .as("graft_m"))
    val stats = base.groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        (sum(col("graft_x").cast(det.D20_6)).cast("double") /
          count(lit(1)).cast("double")).as("mean"))
    val ci = reps
      .groupBy(col("key"))
      .agg(sort_array(collect_list(col("graft_m"))).as("graft_arr"),
        count(lit(1)).as("graft_nb"))
      .select(col("key"),
        det.dpercentile(col("graft_arr"), col("graft_nb"), 0.025).as("lo95"),
        det.dpercentile(col("graft_arr"), col("graft_nb"), 0.975).as("hi95"))
    stats.join(ci, Seq("key"))
      .select(col("key"), col("n"), col("mean"), col("lo95"), col("hi95"))
  }

  val q204 = Q.of(
    "q204_bootstrap_ci",
    s"""WITH base AS (
      |  SELECT c_mktsegment AS key, o_orderkey AS id, o_totalprice AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |), draws AS (
      |  SELECT key, r.r AS r, x,
      |    md5(CAST(id AS VARCHAR) || ':' || CAST(r.r AS VARCHAR)) AS u
      |  FROM base, (SELECT unnest(range(1, $B + 1)) AS r) r
      |), reps AS (
      |  SELECT key, r, x,
      |    (CASE WHEN u >= '${Thresholds(0)}' THEN 1 ELSE 0 END) +
      |    (CASE WHEN u >= '${Thresholds(1)}' THEN 1 ELSE 0 END) +
      |    (CASE WHEN u >= '${Thresholds(2)}' THEN 1 ELSE 0 END) +
      |    (CASE WHEN u >= '${Thresholds(3)}' THEN 1 ELSE 0 END) +
      |    (CASE WHEN u >= '${Thresholds(4)}' THEN 1 ELSE 0 END) +
      |    (CASE WHEN u >= '${Thresholds(5)}' THEN 1 ELSE 0 END) AS w
      |  FROM draws
      |), cells AS (
      |  SELECT key, r,
      |    CAST(SUM(w) AS BIGINT) AS wn,
      |    SUM(CAST(CAST(w AS DOUBLE) * x AS DECIMAL(20,6))) AS wx
      |  FROM reps GROUP BY 1, 2
      |), means AS (
      |  SELECT key, r, CAST(wx AS DOUBLE) / CAST(wn AS DOUBLE) AS m
      |  FROM cells WHERE wn > 0
      |), arrs AS (
      |  SELECT key, list_sort(list(m)) AS arr, COUNT(*) AS nb
      |  FROM means GROUP BY 1
      |), ci AS (
      |  SELECT key,
      |    arr[CAST(FLOOR(0.025 * CAST(nb - 1 AS DOUBLE)) AS INT) + 1]
      |      + (arr[CAST(CEIL(0.025 * CAST(nb - 1 AS DOUBLE)) AS INT) + 1]
      |         - arr[CAST(FLOOR(0.025 * CAST(nb - 1 AS DOUBLE)) AS INT) + 1])
      |        * (0.025 * CAST(nb - 1 AS DOUBLE)
      |           - FLOOR(0.025 * CAST(nb - 1 AS DOUBLE))) AS lo95,
      |    arr[CAST(FLOOR(0.975 * CAST(nb - 1 AS DOUBLE)) AS INT) + 1]
      |      + (arr[CAST(CEIL(0.975 * CAST(nb - 1 AS DOUBLE)) AS INT) + 1]
      |         - arr[CAST(FLOOR(0.975 * CAST(nb - 1 AS DOUBLE)) AS INT) + 1])
      |        * (0.975 * CAST(nb - 1 AS DOUBLE)
      |           - FLOOR(0.975 * CAST(nb - 1 AS DOUBLE))) AS hi95
      |  FROM arrs
      |), stats AS (
      |  SELECT key, COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE) AS mean
      |  FROM base GROUP BY 1
      |)
      |SELECT s.key AS key, s.n, s.mean, c.lo95, c.hi95
      |FROM stats s JOIN ci c ON c.key = s.key
      |ORDER BY key""".stripMargin) { t =>
    bootstrapCi(
      t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey")),
      col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("key"))
  }

  def all: Seq[Q] = Seq(q204)
}
