package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * A corpus mix ("50k docs per source", "balance the languages") must
  * be REPRODUCIBLE — re-running the pipeline on the same input has to
  * pick the same rows, or every downstream artifact (dedup survivors,
  * shard hashes, eval splits) churns. `rand()`-based sampling breaks
  * that (new draw per run, per retry, per speculative task attempt);
  * hashing row CONTENT gives a stable pseudo-random order the same
  * everywhere, every time.
  *
  * Scale shape: one exchange on the stratum column, then a streaming
  * per-group rank ([[TopK.perGroup]]) — no global sort, state is one
  * group at a time. Skewed strata cost their own size to rank, never
  * more.
  */
object Sampling {

  /** Keeps `k` rows per stratum, chosen by md5 of `hashKey` (with
    * `tieBreak` making the order total when hash keys collide —
    * duplicate content, for instance). The hash decorrelates the
    * sample from any input ordering; the result is a uniform-ish,
    * content-addressed, reproducible per-stratum sample.
    */
  def stratifiedDeterministic(df: DataFrame, strataCol: Column, hashKey: Column,
      tieBreak: Column, k: Int): DataFrame = {
    require(k > 0, "sample size must be positive")
    TopK.perGroup(df, Seq(strataCol),
        Seq(md5(hashKey.cast("string")), tieBreak), k, rankCol = "graft_sample_rank")
      .drop("graft_sample_rank")
  }

  /** Deterministic train/val/test split: each row's bucket is decided
    * by comparing md5(`hashKey`) LEXICOGRAPHICALLY against hex-prefix
    * thresholds — pure column arithmetic, no shuffle at all, and the
    * same row lands in the same bucket on every run, engine, and
    * cluster size (which is what makes eval sets stable and leakage
    * auditable). Weights are quantized to 1/65536 (4 hex chars):
    * bucket i receives exactly round(wᵢ·65536)/65536 of the hash
    * space. Lowercase-hex string comparison is identical across
    * engines, so the assignment — not just the counts — has an exact
    * oracle (q79).
    *
    * `splits` = (label, weight) pairs; weights must sum to 1 (±1e-9).
    */
  def hashSplit(df: DataFrame, hashKey: Column, splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two buckets")
    require(splits.forall(_._2 > 0), "weights must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail.dropRight(1)
    val thresholds = cum.map(p => f"${math.round(p * 65536)}%04x")
    val h = md5(hashKey.cast("string"))
    val pairs = thresholds.zip(splits.map(_._1))
    val assigned = pairs.tail.foldLeft(when(h < lit(pairs.head._1), pairs.head._2)) {
      case (acc, (t, label)) => acc.when(h < lit(t), label)
    }.otherwise(splits.last._1)
    df.withColumn(splitCol, assigned)
  }
}
