package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q147: EQUI-WIDTH HISTOGRAM with data-derived bounds — the
  * distribution readout behind every profiling UI and optimizer
  * statistics pass (q106 profiles nulls/distincts/extremes; this is
  * the SHAPE): 20 fixed-width buckets over `l_extendedprice`, each
  * with its exact edges, row count, and decimal-exact value mass —
  * empty buckets included via a generated spine (a histogram with
  * silent holes misreads as a different distribution).
  *
  * Scale shape: pass 1 is a min/max scan that collapses to ONE row
  * (map-side combined; at 100 TB this pass can come straight from
  * parquet footer statistics — the q98 pattern) broadcast back onto
  * the fact; pass 2 is one map-side-combined 20-cell aggregate — the
  * classic two-scan exact histogram (the one-pass alternative is
  * q10b's sketch tier). The spine join and edge windows run over the
  * 20-row frame only.
  *
  * Determinism: the bucket index is FLOOR((x − lo) · 20 / (hi − lo)),
  * every operand bit-identical and the expression mirrored verbatim
  * (floor of a continuous value — a value landing EXACTLY on a bucket
  * edge is representable only when the edge arithmetic is exact, in
  * which case both engines agree; the max value clamps into the last
  * bucket). Counts exact; masses §6 decimal-routed.
  */
object Histogram {

  private val NBuckets = 20

  /** Equi-width histogram of `valCol`. Factored so the spec can pin
    * exact edge landings, the max-value clamp, and empty-bucket
    * presence.
    */
  def histogram(df: DataFrame, valCol: String, nBuckets: Int = NBuckets): DataFrame = {
    val bounds = df.agg(min(col(valCol)).as("lo"), max(col(valCol)).as("hi"))
    val counts = df
      .crossJoin(broadcast(bounds))
      .select(least(
        floor((col(valCol) - col("lo")) * nBuckets / (col("hi") - col("lo"))),
        lit(nBuckets - 1L)).cast("long").as("bucket"),
        col(valCol).as("graft_v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), det.dsum(col("graft_v")).as("mass"))
    val spine = df.sparkSession.range(0, nBuckets).select(col("id").as("bucket"))
    spine
      .join(counts, Seq("bucket"), "left")
      .crossJoin(broadcast(bounds))
      .select(
        col("bucket"),
        (col("lo") + col("bucket").cast("double") * (col("hi") - col("lo")) / nBuckets)
          .as("edge_lo"),
        (col("lo") + (col("bucket") + 1).cast("double") * (col("hi") - col("lo")) / nBuckets)
          .as("edge_hi"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("mass"), lit(0.0)).as("mass"))
  }

  val q147 = Q.of(
    "q147_histogram",
    s"""WITH bounds AS (
      |  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi FROM lineitem
      |), counts AS (
      |  SELECT LEAST(FLOOR((l_extendedprice - lo) * 20 / (hi - lo)), 19) AS bucket,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS mass
      |  FROM lineitem, bounds
      |  GROUP BY 1
      |), spine AS (
      |  SELECT range AS bucket FROM range(0, 20)
      |)
      |SELECT CAST(s.bucket AS BIGINT) AS bucket,
      |  lo + CAST(s.bucket AS DOUBLE) * (hi - lo) / 20 AS edge_lo,
      |  lo + CAST(s.bucket + 1 AS DOUBLE) * (hi - lo) / 20 AS edge_hi,
      |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
      |  COALESCE(c.mass, 0.0) AS mass
      |FROM spine s LEFT JOIN counts c ON s.bucket = c.bucket, bounds
      |ORDER BY s.bucket""".stripMargin) { t =>
    histogram(t.lineitem, "l_extendedprice").orderBy(col("bucket"))
  }

  def all: Seq[Q] = Seq(q147)
}
