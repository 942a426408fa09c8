package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-conditional broadcast hints for dimension tables.
  *
  * A raw `broadcast()` hint never degrades: Spark will build a hash
  * relation out of whatever the dim has become, so a hint that was
  * written against a 25-row nation table silently becomes a
  * driver/executor OOM when an SF-scaled dim grows (customer is ~15 M
  * rows / ~3 GB at sf100). [[dimBroadcast]] applies the hint only
  * while the optimizer's size estimate for the (already filtered and
  * pruned) dim plan stays under a bound; above it the frame is
  * returned unhinted and the join strategy is left to AQE, which
  * still broadcasts at runtime when the ACTUAL size qualifies and
  * otherwise plans a shuffle join — the graceful degradation a hard
  * hint forecloses.
  *
  * The bound is deliberately above `spark.sql.autoBroadcastJoinThreshold`
  * (10 MB default): graft's star joins WANT mid-size dims broadcast
  * (that is the §5 "fact never shuffles for dim joins" rule), and the
  * estimate at hint time is file-size based, i.e. conservative. The
  * bound caps the failure mode, not the optimization.
  */
object Dims {

  /** Session conf key overriding [[defaultMaxBytes]]. */
  val confKey = "graft.broadcast.maxBytes"

  /** 256 MiB — a hash relation this size builds comfortably inside a
    * standard 4–8 GiB executor; anything larger must shuffle.
    */
  val defaultMaxBytes: Long = 256L << 20

  /** `broadcast(df)` when the optimizer's size estimate is under the
    * configured bound; `df` untouched (AQE decides) otherwise.
    */
  def dimBroadcast(df: DataFrame): DataFrame = {
    val max = df.sparkSession.conf.getOption(confKey).map { v =>
      scala.util.Try(v.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"$confKey must be a long byte count, got '$v'"))
    }.getOrElse(defaultMaxBytes)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= max) broadcast(df) else df
  }
}
