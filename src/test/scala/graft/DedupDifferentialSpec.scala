package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import scala.util.Random

/** Fixed-seed differential tests for the LSH dedup pipeline: the
  * banded bucket-join plans vs in-memory brute-force mirrors over the
  * same signatures, and the full verified pipeline vs an O(n²) scan
  * of the corpus. A synthetic corpus with planted near-dup clusters
  * (char-level edits of base docs), exact duplicates, and unrelated
  * tails exercises recall and precision together.
  */
class DedupDifferentialSpec extends SparkSpec {
  import spark.implicits._

  /** ~60 docs: 12 bases; per base 0–2 near-dups (2–4 char edits of a
    * 150-char doc → jaccard well above 0.8) and sometimes an exact
    * copy; plus unrelated fillers sharing the vocabulary.
    */
  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    def doc(len: Int): String =
      (1 to len).map(_ => if (rnd.nextInt(6) == 0) ' ' else ('a' + rnd.nextInt(26)).toChar).mkString
    var id = 0L
    def nextId() = { id += 1; id }
    val out = Seq.newBuilder[(Long, String)]
    for (_ <- 1 to 12) {
      val base = doc(150)
      out += nextId() -> base
      for (_ <- 0 until rnd.nextInt(3)) {
        var d = base
        for (_ <- 0 until 2 + rnd.nextInt(3)) {
          val p = rnd.nextInt(d.length)
          d = d.updated(p, ('a' + rnd.nextInt(26)).toChar)
        }
        out += nextId() -> d
      }
      if (rnd.nextInt(4) == 0) out += nextId() -> base
    }
    for (_ <- 1 to 20) out += nextId() -> doc(100 + rnd.nextInt(100))
    out.result()
  }

  private def charNgrams(s: String, n: Int): Set[String] =
    if (s.length <= n) Set(s) else s.sliding(n).toSet

  private def jaccard(a: String, b: String, n: Int): Double = {
    val (sa, sb) = (charNgrams(a, n), charNgrams(b, n))
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  test("minHashCandidates matches brute-force band collisions over the same signatures") {
    val docs = corpus(91).toDF("id", "text")
    val (bands, rows) = (16, 4)
    val sigs = Dedup.withMinHashFromText(docs, "text", n = 5, numHashes = bands * rows)
    val collected = sigs.select(col("id"), col("minhash")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap

    def bandMatches(a: Vector[Long], b: Vector[Long]): Int =
      (0 until bands).count(k => a.slice(k * rows, (k + 1) * rows) == b.slice(k * rows, (k + 1) * rows))

    for (minMatches <- Seq(1, 2)) {
      val out = Dedup.minHashCandidates(sigs, "id", bands, rows, minMatches)
        .select("doc_a", "doc_b", "est_jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val ids = collected.keys.toSeq.sorted
      val expect = (for {
        i <- ids.indices; j <- i + 1 until ids.size
        (a, b) = (ids(i), ids(j))
        if bandMatches(collected(a), collected(b)) >= minMatches
      } yield {
        val agree = (0 until bands * rows)
          .count(k => collected(a)(k) == collected(b)(k)).toDouble / (bands * rows)
        (a, b) -> agree
      }).toMap
      assert(out.keySet == expect.keySet,
        s"candidate set mismatch at minBandMatches=$minMatches: " +
          s"extra=${out.keySet -- expect.keySet} missing=${expect.keySet -- out.keySet}")
      out.foreach { case (p, e) =>
        assert(e == expect(p), s"est_jaccard mismatch for $p: $e vs ${expect(p)}")
      }
      CacheScope.releaseAll()
    }
  }

  test("simHashCandidates matches brute-force banded hamming over the same signatures") {
    val docs = corpus(92).toDF("id", "text")
    val sigs = Dedup.withSimHash(docs, "text")
    val collected = sigs.select(col("id"), col("simhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxHamming = 12
    val out = Dedup.simHashCandidates(sigs, "id", maxHamming)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ids = collected.keys.toSeq.sorted
    def sharesBand(x: Long, y: Long): Boolean =
      (0 until 4).exists(b => ((x >>> (b * 16)) & 0xffffL) == ((y >>> (b * 16)) & 0xffffL))
    val expect = (for {
      i <- ids.indices; j <- i + 1 until ids.size
      (a, b) = (ids(i), ids(j))
      if sharesBand(collected(a), collected(b))
      h = java.lang.Long.bitCount(collected(a) ^ collected(b))
      if h <= maxHamming
    } yield (a, b) -> h.toLong).toMap
    assert(out == expect,
      s"extra=${out.keySet -- expect.keySet} missing=${expect.keySet -- out.keySet}")
    CacheScope.releaseAll()
  }

  test("nearDupPairs equals the O(n^2) jaccard scan; dropNearDups keeps min-id survivors") {
    val n = 5
    val minJ = 0.8
    for (seed <- Seq(93, 94)) {
      val data = corpus(seed)
      val docs = data.toDF("id", "text")
      val out = Dedup.nearDupPairs(docs, "id", "text", n, minJ)
        .select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val expect = (for {
        i <- data.indices; j <- i + 1 until data.size
        jac = jaccard(data(i)._2, data(j)._2, n)
        if jac >= minJ
      } yield (data(i)._1, data(j)._1) -> jac).toMap
      assert(out.keySet == expect.keySet,
        s"pair set mismatch at seed $seed: extra=${out.keySet -- expect.keySet} " +
          s"missing=${expect.keySet -- out.keySet}")
      // TextJaccard and the mirror run the same counting formula on
      // exact sets - values must agree exactly, not approximately
      out.foreach { case (p, jac) =>
        assert(jac == expect(p), s"jaccard mismatch for $p at seed $seed")
      }

      // survivors: union-find over the exact pair set, min id lives
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      expect.keys.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val inComponent = expect.keySet.flatMap(p => Set(p._1, p._2))
      val expectKept = data.map(_._1).filter(id =>
        !inComponent(id) || {
          val comp = inComponent.filter(x => find(x) == find(id))
          id == comp.min
        }).toSet
      val kept = Dedup.dropNearDups(docs, "id", "text", n, minJ)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(kept == expectKept,
        s"survivor mismatch at seed $seed: extra=${kept -- expectKept} " +
          s"missing=${expectKept -- kept}")
      CacheScope.releaseAll()
    }
  }
}
