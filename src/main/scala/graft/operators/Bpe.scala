package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TRAINING (Sennrich et al. 2016) on the corpus
  * word-frequency dictionary.
  *
  * The published algorithm trains on the word-frequency dict, not the
  * corpus: the distributed side reduces the corpus to (word, count) —
  * one exchange keyed on the word — and takes a deterministic top-V
  * slice (count desc, word asc, via TakeOrderedAndProject: per-partition
  * top-V, merged on the driver — never a global sort). The dict is the
  * ONLY driver state (V entries — the Lloyd-centroid budget class;
  * vocabulary grows ~Heaps-law sublinearly, and top-V caps it
  * regardless). The merge loop itself is a pure in-driver fold over
  * that dict; the learned table ships to executors inside
  * [[graft.functions.BpeTokenize]] and encoding is a zero-shuffle
  * projection.
  *
  * Determinism: pair counts are exact longs; the argmax tie-breaks
  * lexicographically, so the merge sequence is a pure function of the
  * dict, hence of the corpus — identical across runs, partitionings,
  * and cluster sizes.
  */
object Bpe {

  /** Ordered merge table from a word-frequency dict. Stops early when
    * no adjacent pair occurs twice (merging hapax pairs would just
    * memorize words).
    */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordCounts.iterator
      .map { case (w, c) => (w.toCharArray.map(String.valueOf(_)), c) }
      .toArray
    val merges = mutable.ArrayBuffer[(String, String)]()
    var step = 0
    while (step < nMerges) {
      val pairCounts = mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      val candidates = pairCounts.filter(_._2 >= 2L)
      if (candidates.isEmpty) return merges.toSeq
      val best = candidates.minBy { case ((a, b), c) => (-c, a, b) }._1
      merges += best
      words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
      step += 1
    }
    merges.toSeq
  }

  private def mergeOnce(syms: Array[String], pair: (String, String)): Array[String] = {
    val (a, b) = pair
    val out = new Array[String](syms.length)
    var w = 0
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out(w) = a + b; j += 2
      } else {
        out(w) = syms(j); j += 1
      }
      w += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  /** Distributed dict build + in-driver training. */
  def learnFromCorpus(docs: DataFrame, textCol: String,
      topV: Int, nMerges: Int): Seq[(String, String)] = {
    val dict = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(topV)
      .collect() // ≤ topV rows — bounded driver state by construction
      .map(r => (r.getString(0), r.getLong(1)))
    train(dict.toSeq, nMerges)
  }

  /** Zero-shuffle token count column under a trained merge table. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftx.Bridge.column(
      graft.functions.BpeTokenize(
        org.apache.spark.sql.graftx.Bridge.expression(text), merges))
}
