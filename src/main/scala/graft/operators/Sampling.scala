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
}
