package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q187: KMV-SKETCH retention (*rows-only*) — the APPROXIMATE twin of
  * q176's exact bitmap algebra: month-over-month active/retained
  * estimates from K-MINIMUM-VALUES sketches (Bar-Yossef et al. 2002
  * / the theta-sketch family, public). Where q176's per-bucket
  * bitmaps are exact but sized by the KEY DOMAIN (4 KB per 32k-key
  * bucket — perfect for dense integer keys, unbounded for open
  * domains), a KMV sketch is K hashes REGARDLESS of domain: the
  * open-domain mergeable-state answer, with ~1/√K relative error.
  *
  * Estimator: with hashes mapped to the non-negative long line
  * [0, 2⁶³), n̂ = (K−1) · 2⁶³ / h₍K₎ (the classic unbiased KMV form);
  * union sketches merge by "K smallest of the concatenation", so
  * |A∪B| estimates from the SAME K-row state, and retained comes
  * from inclusion–exclusion exactly as q176 — every set-algebra step
  * downstream of the sketch is arithmetic on K-bounded frames.
  * Months whose true actives ≤ K are EXACT (the sketch holds every
  * distinct hash and n̂ degrades to the observed count), which the
  * spec pins.
  *
  * Scale shape: ONE distinct (month, hash) exchange collapses the
  * fact; per-month top-K via the q08 rank-window over the collapsed
  * frame (each partition K-bounded downstream); adjacent-pair unions
  * re-rank the ≤ 2K paired rows. Nothing anywhere is proportional to
  * the key domain — this is the sketch a 100 TB pipeline stores per
  * partition and merges at read time. No SQL oracle: DuckDB cannot
  * replay the estimator's hash order — KmvSpec pins the estimates
  * against the EXACT q176 retention on the same frame with a 3/√K
  * error envelope, plus the ≤ K exactness floor.
  */
object KmvSketch {

  private val SketchK = 256

  /** Non-negative 63-bit hash of the key column. */
  private def hv(c: org.apache.spark.sql.Column) =
    xxhash64(c).bitwiseAND(lit(Long.MaxValue))

  /** KMV estimate column from the K-th smallest hash and the observed
    * distinct count (exact when the sketch isn't full). */
  private def estimate(kth: org.apache.spark.sql.Column,
      nSeen: org.apache.spark.sql.Column, k: Int) =
    when(nSeen < k, nSeen.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(Long.MaxValue.toDouble) /
        kth.cast("double"))

  /** Per-period KMV sketch rows: (period, hash, rank ≤ k). */
  def sketch(df: DataFrame, periodCol: String, keyCol: String,
      k: Int = SketchK): DataFrame = {
    val byHash = Window.partitionBy(col("graft_p")).orderBy(col("graft_h"))
    df.select(col(periodCol).as("graft_p"), hv(col(keyCol)).as("graft_h"))
      .distinct()
      .withColumn("graft_rk", row_number().over(byHash))
      .filter(col("graft_rk") <= k)
  }

  /** Adjacent-period retention estimates from per-period sketches.
    * Emits (month_key, n_active_est, retained_est) per period with a
    * predecessor. */
  def retention(df: DataFrame, periodCol: String, keyCol: String,
      k: Int = SketchK): DataFrame = {
    val sk = graft.CacheScope.trackedCache(sketch(df, periodCol, keyCol, k))
    val perMonth = sk.groupBy(col("graft_p"))
      .agg(max(col("graft_h")).as("graft_kth"), count(lit(1)).as("graft_n"))
      .select(col("graft_p"),
        estimate(col("graft_kth"), col("graft_n"), k).as("graft_est"))
    val byPair = Window.partitionBy(col("graft_pair")).orderBy(col("graft_h"))
    val unions = sk.select((col("graft_p") + 1).as("graft_pair"), col("graft_h"))
      .unionAll(sk.select(col("graft_p").as("graft_pair"), col("graft_h")))
      .distinct() // a key in both months must count once in the union
      .withColumn("graft_rk", row_number().over(byPair))
      .filter(col("graft_rk") <= k)
      .groupBy(col("graft_pair"))
      .agg(max(col("graft_h")).as("graft_kth"), count(lit(1)).as("graft_n"))
      .select(col("graft_pair"),
        estimate(col("graft_kth"), col("graft_n"), k).as("graft_un"))
    perMonth.as("cur")
      .join(perMonth.select((col("graft_p") + 1).as("graft_p"),
        col("graft_est").as("graft_prev")), Seq("graft_p"))
      .join(unions, col("graft_p") === col("graft_pair"))
      .select(
        col("graft_p").as("month_key"),
        col("graft_est").as("n_active_est"),
        (col("graft_prev") + col("graft_est") - col("graft_un"))
          .as("retained_est"))
  }

  val q187 = Q.rowsOnly("q187_kmv_retention") { t =>
    retention(
      t.orders.select(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mk"),
        col("o_custkey")),
      "mk", "o_custkey")
      .orderBy(col("month_key"))
  }

  def all: Seq[Q] = Seq(q187)
}
