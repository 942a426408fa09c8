package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra–Gries frequent-items summary as a typed Dataset
  * [[Aggregator]] — the bounded-memory heavy-hitters sketch
  * (SURVEY §2 q37): at most `k` counters per aggregation state, any
  * item with true frequency > N/(k+1) is guaranteed present in the
  * result, and every reported estimate undercounts the truth by at
  * most N/(k+1).
  *
  * This is the custom-AGGREGATE tier of the extension ladder (the
  * scalar tier is the native Expressions in sketch.scala): state is a
  * plain Map[String, Long] of size ≤ k, reduced per partition
  * (map-side — only k counters per group ride the shuffle) and merged
  * associatively with the standard MG merge (sum counters, subtract
  * the (k+1)-th largest weight from all, drop non-positives). The
  * exact groupBy-count alternative shuffles one row per DISTINCT item
  * per group — unbounded at 100 TB of tokens; this ships k counters
  * per group regardless of cardinality.
  *
  * Merge error: each decrement step is itself an MG step, so the
  * merged summary keeps the standard guarantee (proof in Agarwal et
  * al., "Mergeable Summaries", PODS 2012 — public literature).
  */
class FrequentItems(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(acc: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    if (acc.contains(item) || acc.size < k) {
      acc.update(item, acc.getOrElse(item, 0L) + 1L)
    } else {
      // decrement-all: drop every counter by 1, evict zeros
      val dead = mutable.ArrayBuffer.empty[String]
      for ((key, n) <- acc) {
        if (n == 1L) dead += key else acc.update(key, n - 1L)
      }
      dead.foreach(acc.remove)
    }
    acc
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    for ((key, n) <- b) a.update(key, a.getOrElse(key, 0L) + n)
    if (a.size > k) {
      // subtract the (k+1)-th largest weight, keep positives (≤ k)
      val cut = a.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      val dead = a.collect { case (key, n) if n - cut <= 0L => key }.toSeq
      dead.foreach(a.remove)
      for ((key, n) <- a) a.update(key, n - cut)
    }
    a
  }

  override def finish(acc: mutable.Map[String, Long]): Map[String, Long] = acc.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
