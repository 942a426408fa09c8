package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import scala.util.Random

import graft.queries.{Chunking, Concurrency, FuzzyMatch, NodeSim}

/** Fixed-seed randomized differential tests for the round-9
  * continuation wave: each operator vs an exhaustive in-memory
  * reference on random inputs built to hit the adversarial shapes
  * (zero-length and touching intervals, equal-instant ties, typo
  * clusters inside one block, degenerate one-token documents,
  * isolated graph nodes). Seeds pinned so failures replay verbatim.
  */
class WaveDifferentialSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // ---------------------------------------------------------------
  // q134 sweep line vs brute-force point probing
  // ---------------------------------------------------------------
  test("q134 sweep peak matches brute-force interval counting (3 seeds)") {
    for (seed <- Seq(21, 22, 23)) {
      val rnd = new Random(seed)
      // small time domain → dense ties, touching ends, zero lengths
      val ivs = (1 to 200).map { _ =>
        (rnd.nextInt(4).toLong, rnd.nextInt(30).toLong, rnd.nextInt(6).toLong)
      }
      val out = Concurrency.userConcurrency(
        df("user_id LONG, us LONG, dur_us LONG")(
          ivs.map { case (u, s, d) => Row(u, s, d) }))
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("peak_concurrent"), r.getAs[Long]("n_intervals"))).toMap
      // reference: peak over half-open [s, s+d) by probing every start
      // of a NON-EMPTY interval (the max is attained at some start)
      ivs.groupBy(_._1).foreach { case (u, group) =>
        val nonEmpty = group.filter(_._3 > 0)
        val expectPeak =
          if (nonEmpty.isEmpty) 0L
          else nonEmpty.map { case (_, p, _) =>
            nonEmpty.count { case (_, s, d) => s <= p && p < s + d }.toLong
          }.max
        assert(out(u)._1 == expectPeak,
          s"seed $seed user $u: sweep ${out(u)._1} vs brute $expectPeak")
        assert(out(u)._2 == group.size.toLong)
      }
    }
  }

  // ---------------------------------------------------------------
  // q133 blocked matching vs in-memory reference over the same blocks
  // ---------------------------------------------------------------
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q133 finds exactly the in-block pairs under the gate (3 seeds)") {
    val nouns = Seq("bolt", "gear", "ring")
    val adjs = Seq("red", "rod", "rad", "blue", "blot", "green")
    for (seed <- Seq(31, 32, 33)) {
      val rnd = new Random(seed)
      val names = (1 to 40).map(_ => s"${adjs(rnd.nextInt(adjs.length))} ${nouns(rnd.nextInt(nouns.length))}")
      val out = FuzzyMatch.blockedPairs(
        df("name STRING")(names.map(Row(_))), maxDist = 2)
        .collect().map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"))).toSet
      val distinct = names.distinct
      val expect = (for {
        a <- distinct; b <- distinct
        if a < b
        if a.split(" ").last == b.split(" ").last
        if lev(a, b) <= 2
      } yield (a, b)).toSet
      assert(out == expect, s"seed $seed: ${out.diff(expect)} / ${expect.diff(out)}")
    }
  }

  // ---------------------------------------------------------------
  // q126 chunk invariants on random documents
  // ---------------------------------------------------------------
  test("q126 chunks tile the document: coverage, stride starts, content (3 seeds)") {
    val (chunk, stride) = (8, 4)
    for (seed <- Seq(41, 42, 43)) {
      val rnd = new Random(seed)
      val docs = (1L to 30L).map { id =>
        id -> (1 to (1 + rnd.nextInt(30))).map(i => s"w${rnd.nextInt(9)}").mkString(" ")
      }
      val out = Chunking.chunks(
        df("doc_id LONG, text STRING")(docs.map { case (id, t) => Row(id, t) }),
        chunk, stride)
        .collect().groupBy(_.getAs[Long]("doc_id"))
      docs.foreach { case (id, text) =>
        val toks = text.split(" ")
        val rows = out(id).sortBy(_.getAs[Long]("chunk_idx"))
        // starts are exactly the stride multiples below the token count
        assert(rows.length == (toks.length + stride - 1) / stride)
        rows.zipWithIndex.foreach { case (r, i) =>
          val start = i * stride
          val expect = toks.slice(start, start + chunk)
          assert(r.getAs[Long]("n_tokens") == expect.length.toLong)
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(expect.mkString(" ").getBytes)
            .map("%02x".format(_)).mkString
          assert(r.getAs[String]("chunk_md5") == md5, s"seed $seed doc $id chunk $i")
        }
        // every token position is covered by some chunk
        val covered = rows.indices.flatMap(i => i * stride until
          (i * stride + rows(i).getAs[Long]("n_tokens")).toInt).toSet
        assert(covered == toks.indices.toSet)
      }
    }
  }

  // ---------------------------------------------------------------
  // q128 neighbor Jaccard vs brute-force set arithmetic
  // ---------------------------------------------------------------
  test("q128 per-edge Jaccard matches brute-force neighbor sets (3 seeds)") {
    for (seed <- Seq(51, 52, 53)) {
      val rnd = new Random(seed)
      val baskets = (1 to 150).map { _ =>
        (rnd.nextInt(25).toLong + 100L, rnd.nextInt(12).toLong)
      }.distinct
      val out = NodeSim.neighborJaccard(
        df("ok LONG, pk LONG")(baskets.map { case (o, p) => Row(o, p) }),
        "ok", "pk", minSupport = 2)
        .collect().map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb")) ->
          (r.getAs[Long]("n_common"), r.getAs[Double]("jaccard"))).toMap
      // reference: support-pruned edges, then set intersections
      val byOrder = baskets.groupBy(_._1).values.map(_.map(_._2).toSet)
      val pairCounts = byOrder.toSeq
        .flatMap(s => for (a <- s; b <- s if a < b) yield (a, b))
        .groupBy(identity).view.mapValues(_.size).toMap
      val edges = pairCounts.filter(_._2 >= 2).keySet
      val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(out.keySet == edges, s"seed $seed edge sets differ")
      edges.foreach { case (a, b) =>
        val inter = (nbrs(a) & nbrs(b)).size.toLong
        val union = (nbrs(a) | nbrs(b)).size.toLong
        assert(out((a, b))._1 == inter)
        assert(out((a, b))._2 == inter.toDouble / union.toDouble, s"seed $seed ($a,$b)")
      }
    }
  }
}
