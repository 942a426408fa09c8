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

  /** Materialize a trained merge table as (rank, a, b) parquet — the
    * oracle handshake: training is not SQL-replayable, but ENCODING
    * under a fixed merge table is (a deterministic fold of per-merge
    * string rewrites), so the builder publishes the learned table and
    * the DuckDB oracle replays the encode loop over it via
    * list_reduce. rank is 1-based merge order. Overwrite keeps re-runs
    * idempotent; content is a pure function of the corpus, so
    * concurrent same-sf writers converge on identical bytes.
    */
  def materialize(docs: DataFrame, merges: Seq[(String, String)], dir: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Zero-shuffle token count column under a trained merge table. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftx.Bridge.column(
      graft.functions.BpeTokenize(
        org.apache.spark.sql.graftx.Bridge.expression(text), merges))

  /** Shared DuckDB CTE chain replaying the encode loop over a
    * [[materialize]]d merge table: per-doc whitespace word counts,
    * the distinct-word working set, and each word's token count.
    *
    * Encoding model (provably ≡ [[graft.functions.BpeTokenize]]'s
    * min-rank-first loop on TRAINED tables): apply merges in rank
    * order, each as ONE left-to-right non-overlapping rewrite. A
    * merged symbol a+b can never itself be the a or b of the same
    * pair (both non-empty), so one pass per merge is exhaustive; and
    * a trained table can't rank (x, yz) before (y, z) — the symbol yz
    * must exist to be counted — so rank order ≡ global min-rank order
    * (BpeSpec pins the equivalence with an independent encoder).
    *
    * String mechanics: a word's symbol list rides as
    * US·s1·US·US·s2·US·…·US (US = chr(31), one wrap per symbol), so
    * merge (a, b) is replace("US a US US b US" → "US ab US") — the
    * double separator prevents false matches across symbol contents,
    * and token count = |US|/2. Merge pairs ride as a·chr(1)·b in one
    * ordered list folded by list_reduce (no recursive CTE — the q179
    * re-inlining lesson). Control chars chr(1)/chr(31) must not occur
    * in corpus text (true of the testdata; a real deployment would
    * escape them at ingest).
    */
  def oracleEncodeCtes(mergesDir: String): String =
    s"""ms AS (
      |  SELECT list(a || chr(1) || b ORDER BY rank) AS ml
      |  FROM read_parquet('$mergesDir/*.parquet')
      |), wcnt AS (
      |  SELECT doc_id, w, COUNT(*) AS cnt FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      |  ) WHERE len(w) > 0 GROUP BY 1, 2
      |), dw AS (
      |  SELECT DISTINCT w FROM wcnt
      |), enc AS (
      |  SELECT w, list_reduce(
      |    list_concat(
      |      [chr(31) || array_to_string(string_split(w, ''), chr(31) || chr(31)) || chr(31)],
      |      (SELECT ml FROM ms)),
    (acc, m) -> replace(acc,
      chr(31) || split_part(m, chr(1), 1) || chr(31) || chr(31) ||
        split_part(m, chr(1), 2) || chr(31),
      chr(31) || split_part(m, chr(1), 1) ||
        split_part(m, chr(1), 2) || chr(31))) AS s
      |  FROM dw
      |), wtok AS (
      |  SELECT w, (len(s) - len(replace(s, chr(31), ''))) // 2 AS ntok FROM enc
      |), dtok AS (
      |  SELECT doc_id, CAST(SUM(cnt * ntok) AS BIGINT) AS t
      |  FROM wcnt JOIN wtok USING (w) GROUP BY 1
      |)""".stripMargin
}
