package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q203: ONE-WAY ANOVA F — the k-sample generalization of q192's
  * Welch pair test (Fisher, public): does order size differ across
  * the FIVE priority classes at once, instead of one chosen pair?
  * Emits the between/within decomposition (SSB, SSW), F, and η² =
  * SSB/SST — the effect-size readout (how much of the variance the
  * grouping explains) that a significance number alone hides.
  *
  * Determinism: per-group moments n, Σx, Σx² are exact D28_6 sums
  * (q192's lanes); the per-group terms s₁²/n and s₂ − s₁²/n are each
  * ONE IEEE expression over exact operands, and the cross-group fold
  * adds them in EXPLICIT sorted-key order over the bounded k-entry
  * array (sort_array + aggregate ≡ list_sort + list_reduce) — NOT a
  * SUM aggregate (engine-chosen order) and NOT a D28_6 re-quantize:
  * §6(l) — quantizing a double ≥ ~10¹⁰ to 6 decimals is not
  * cross-engine-stable (the 6-decimal digits sit below the double's
  * own ULP; DuckDB's DOUBLE→DECIMAL multiplies in floating point
  * while Spark expands the exact binary value — observed diverging
  * at sf0.01 on this very query). Every DECIMAL→DOUBLE cast of the
  * wide sums bounces through VARCHAR on the oracle side (§6(k)).
  * F and η² are single IEEE chains over the folded doubles,
  * token-identical in the oracle, no rounding. k < 2, N ≤ k, or
  * SSW = 0 guard to NULL.
  *
  * Scale shape: ONE fact scan → k moment cells (map-side combined —
  * cells cross the exchange, never rows) → one-row fold over the
  * bounded k-entry array. Identical cost to q192 regardless of k.
  */
object Anova {

  /** One-row one-way ANOVA of `v` across `key` groups. Factored so
    * the spec can pin a hand-computed two-group case (where F = t²
    * of the equal-variance t), the all-equal-means zero, and the
    * degenerate guards.
    */
  def anovaF(df: DataFrame, key: Column, v: Column): DataFrame = {
    val cells = df.select(key.as("graft_k"), v.as("graft_v"))
      .groupBy(col("graft_k"))
      .agg(
        count(lit(1)).as("graft_n"),
        sum(col("graft_v").cast(det.D28_6)).as("graft_s1"),
        sum((col("graft_v") * col("graft_v")).cast(det.D28_6)).as("graft_s2"))
    val nD = col("graft_n").cast("double")
    val s1D = col("graft_s1").cast("double")
    val s2D = col("graft_s2").cast("double")
    cells
      .select(col("graft_n"), col("graft_s1"),
        struct(col("graft_k").as("g"),
          (s1D * s1D / nD).as("b"),
          (s2D - s1D * s1D / nD).as("w")).as("graft_t"))
      .agg(
        count(lit(1)).as("k"),
        sum(col("graft_n")).as("n"),
        sum(col("graft_s1")).as("graft_s"),
        sort_array(collect_list(col("graft_t"))).as("graft_arr"))
      .select(
        col("k"), col("n"),
        (aggregate(col("graft_arr"), lit(0.0),
          (acc, x) => acc + x.getField("b")) -
          col("graft_s").cast("double") * col("graft_s").cast("double") /
            col("n").cast("double")).as("ssb"),
        aggregate(col("graft_arr"), lit(0.0),
          (acc, x) => acc + x.getField("w")).as("ssw"))
      .select(
        col("k"), col("n"), col("ssb"), col("ssw"),
        when(col("k") >= 2 && col("n") > col("k") && col("ssw") > 0.0,
          (col("ssb") / (col("k") - 1).cast("double")) /
            (col("ssw") / (col("n") - col("k")).cast("double"))).as("f"),
        when(col("ssb") + col("ssw") > 0.0,
          col("ssb") / (col("ssb") + col("ssw"))).as("eta2"))
  }

  val q203 = Q.of(
    "q203_anova_f",
    """WITH cells AS (
      |  SELECT o_orderpriority AS k,
      |    COUNT(*) AS cn,
      |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS s1,
      |    SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(28,6))) AS s2
      |  FROM orders GROUP BY 1
      |), folded AS (
      |  SELECT
      |    CAST(COUNT(*) AS BIGINT) AS k,
      |    CAST(SUM(cn) AS BIGINT) AS n,
      |    SUM(s1) AS s,
      |    list_sort(list({'g': k,
      |      'b': CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
      |        * CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(cn AS DOUBLE),
      |      'w': CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
      |        - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
      |          * CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(cn AS DOUBLE)}))
      |      AS arr
      |  FROM cells
      |), e AS (
      |  SELECT k, n,
      |    list_reduce(list_transform(arr, x -> x.b), (acc, u) -> acc + u)
      |      - CAST(CAST(s AS VARCHAR) AS DOUBLE)
      |        * CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
      |    list_reduce(list_transform(arr, x -> x.w), (acc, u) -> acc + u)
      |      AS ssw
      |  FROM folded
      |)
      |SELECT k, n, ssb, ssw,
      |  CASE WHEN k >= 2 AND n > k AND ssw > 0.0 THEN
      |    (ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)) END AS f,
      |  CASE WHEN ssb + ssw > 0.0 THEN ssb / (ssb + ssw) END AS eta2
      |FROM e""".stripMargin) { t =>
    anovaF(t.orders, col("o_orderpriority"), col("o_totalprice"))
  }

  def all: Seq[Q] = Seq(q203)
}
