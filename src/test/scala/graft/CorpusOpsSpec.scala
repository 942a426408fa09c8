package graft

import org.apache.spark.sql.functions._

import graft.queries.{Chunking, Collocation, CompressionQuality, NodeSim}

/** Behavioral + plan-shape checks for the round-9 corpus/graph ops
  * (q126 token chunking, q127 PMI collocations, q128 neighbor
  * Jaccard) — the oracle proves cross-engine agreement on the
  * synthetic corpus; these pin semantics on crafted inputs (chunk
  * boundary cases, hand-computed PMI distributions, a hand-built
  * graph) and the zero-shuffle chunking plan the Scaladoc promises.
  */
class CorpusOpsSpec extends SparkSpec {

  // ---- q126: token chunking ----

  test("q126 chunk boundaries: short doc, exact multiple, trailing partial") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),   // < chunk → one chunk of 10
      (2L, (1 to 32).map(i => s"t$i").mkString(" ")),   // == chunk → 32, 16
      (3L, (1 to 33).map(i => s"t$i").mkString(" ")))   // starts 0,16,32 → 32, 17, 1
      .toDF("doc_id", "text")
    val out = Chunking.chunks(docs, chunk = 32, stride = 16).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) =>
        d -> rs.sortBy(_.getAs[Long]("chunk_idx")).map(_.getAs[Long]("n_tokens")).toSeq }
    assert(out(1L) == Seq(10L))
    // a 32-token doc still gets the start-16 window (16 trailing tokens)
    assert(out(2L) == Seq(32L, 16L))
    assert(out(3L) == Seq(32L, 17L, 1L))
  }

  test("q126 chunk content is pinned by md5, and chunking never shuffles") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val one = Chunking.chunks(docs, chunk = 32, stride = 16).collect().head
    assert(one.getAs[String]("chunk_md5") ==
      java.security.MessageDigest.getInstance("MD5").digest("a b c".getBytes)
        .map("%02x".format(_)).mkString)
    // the registry form: explode + slice + hash ride the scan; the
    // only exchange is the presentation sort
    val df = run("q126_token_chunks")
    df.collect()
    assert(shuffles(df).size <= 1,
      s"q126 chunking must be shuffle-free before the sort, got ${shuffles(df).size}")
  }

  // ---- q127: PMI collocations ----

  private def bigramDocs(rows: Seq[(String, Int)]) = {
    import spark.implicits._
    rows.flatMap { case (bg, n) => Seq.fill(n)(bg) }
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("q127 PMI signs: attraction positive, repulsion negative, independence zero") {
    // 16 bigram events: (p,q) ×6, (r,s) ×6, (p,s) ×2, (r,q) ×2
    // PMI(p,q) = ln(16·6 / (8·8)) = ln 1.5; PMI(p,s) = ln(16·2/64) = ln 0.5
    val contrasted = Collocation.pmi(
      bigramDocs(Seq(("p q", 6), ("r s", 6), ("p s", 2), ("r q", 2))), 1)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")) -> r).toMap
    val pq = contrasted(("p", "q"))
    assert(pq.getAs[Long]("c_ab") == 6L && pq.getAs[Long]("c_left") == 8L)
    assert(math.abs(pq.getAs[Double]("pmi") - math.round(math.log(1.5) * 1e4) / 1e4) < 1e-9)
    assert(contrasted(("p", "s")).getAs[Double]("pmi") < 0)
    // 2×2 independent design: every pair has B·c_ab = c_l·c_r → PMI 0
    val indep = Collocation.pmi(
      bigramDocs(Seq(("a b", 2), ("a c", 2), ("d b", 2), ("d c", 2))), 1).collect()
    assert(indep.length == 4 && indep.forall(_.getAs[Double]("pmi") == 0.0))
  }

  test("q127 min-support gates the report") {
    val out = Collocation.pmi(bigramDocs(Seq(("p q", 6), ("x y", 2))), 3).collect()
    assert(out.map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSet == Set(("p", "q")))
  }

  // ---- q128: neighbor Jaccard ----

  test("q128 hand-built graph: triangle + pendant, support gate") {
    import spark.implicits._
    // edges (support 2): 1-2, 1-3, 2-3 (triangle), 1-4 (pendant);
    // basket 105 appears once → node 5 never enters the graph
    val baskets = Seq(
      (101L, 1L), (101L, 2L), (101L, 3L),
      (102L, 1L), (102L, 2L), (102L, 3L),
      (103L, 1L), (103L, 4L), (104L, 1L), (104L, 4L),
      (105L, 1L), (105L, 5L))
      .toDF("ok", "pk")
    val out = NodeSim.neighborJaccard(baskets, "ok", "pk", 2).collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb")) -> r).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)))
    // N(1)={2,3,4}, N(2)={1,3}: common {3}, union 3+2-1=4
    val e12 = out((1L, 2L))
    assert(e12.getAs[Long]("n_common") == 1L && e12.getAs[Double]("jaccard") == 0.25)
    // N(2)∩N(3)={1}, union 2+2-1=3
    assert(math.abs(out((2L, 3L)).getAs[Double]("jaccard") - 1.0 / 3.0) < 1e-15)
    // pendant edge: no common neighbor → 0 via the left-join fill
    assert(out((1L, 4L)).getAs[Long]("n_common") == 0L
      && out((1L, 4L)).getAs[Double]("jaccard") == 0.0)
  }

  // ---- q132: compression-ratio quality gate ----

  test("q132 bands: templated ≫ natural ≫ random, ladder fires correctly") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val printable = (33 to 126).map(_.toChar).mkString
    val docs = Seq(
      (1L, Seq.fill(300)("spam ham").mkString(" ")),                     // templated
      (2L, "the quick brown fox jumps over a lazy dog while seven " +
        "wizards brew quirky potions behind the velvet curtain and " +
        "marginal taxes rise gently across the northern provinces " +
        "during an otherwise unremarkable fiscal quarter of reforms"),   // natural prose
      (3L, Seq.fill(2000)(printable(rnd.nextInt(printable.length))).mkString)) // random
      .toDF("doc_id", "text")
    val out = CompressionQuality.withVerdict(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val (rt, rn, rr) = (out(1L).getAs[Double]("ratio"),
      out(2L).getAs[Double]("ratio"), out(3L).getAs[Double]("ratio"))
    assert(rt > rn && rn > rr, s"band order violated: $rt / $rn / $rr")
    assert(out(1L).getAs[String]("verdict") == "templated")
    assert(out(2L).getAs[String]("verdict") == "natural")
    assert(out(3L).getAs[String]("verdict") == "incompressible")
  }

  test("q132 deflates inside the one scan stage: no exchange before the rollup") {
    val df = run("q132_compression_quality")
    df.collect()
    assert(shuffles(df).size <= 2,
      s"q132 expected rollup + sort exchanges only, got ${shuffles(df).size}")
    val scans = physicalNodes(df).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, s"q132 must profile in one documents scan, got ${scans.size}")
  }
}
