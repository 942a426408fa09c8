package graft

import org.apache.spark.sql.functions._

import graft.queries.{Boilerplate, Classifier, Semantic}

/** Behavioral checks for the round-9 semantic-curation tier
  * (q115–q117) on crafted inputs — the oracles prove cross-engine
  * agreement on the synthetic corpus; these pin the SEMANTICS on
  * hand-computable fixtures (known cluster geometry, planted shared
  * blocks, independently-recomputed hash weights).
  */
class SemanticSpec extends SparkSpec {

  // ---- q115 semantic dedup -------------------------------------------

  test("q115 keep-first dedup fires only WITHIN a cluster") {
    import spark.implicits._
    // anchors: 0 → x-axis, 1 → y-axis (dim 3). Members chosen so every
    // cosine involved is hand-computable:
    //   10 [.6,0,.8]    cluster 0, no earlier twin → keep
    //   11 [.6,.01,.8]  ≈ 10 (cos ≈ .99996)        → drop, kept_by 10
    //   12 [.8,0,-.6]   cluster 0, ⊥ 10 (cos = 0)  → keep
    //   13 [.5,.6,.62]  cluster 1 \  cos(13,14) ≈ .99 ≥ τ but DIFFERENT
    //   14 [.6,.5,.62]  cluster 0 /  clusters → both keep (the SemDeDup
    //                                within-cell contract)
    val e = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0)),
      (10L, Seq(0.6, 0.0, 0.8)),
      (11L, Seq(0.6, 0.01, 0.8)),
      (12L, Seq(0.8, 0.0, -0.6)),
      (13L, Seq(0.5, 0.6, 0.62)),
      (14L, Seq(0.6, 0.5, 0.62)))
      .toDF("vec_id", "v")
    val r = Semantic.report(e, anchors = 2, tau = 0.9).collect()
      .map(x => x.getAs[Long]("vec_id") -> x).toMap
    assert(r.size == 7)
    val verdicts = r.view.mapValues(_.getAs[String]("verdict")).toMap
    assert(verdicts == Map(0L -> "keep", 1L -> "keep", 10L -> "keep",
      11L -> "drop", 12L -> "keep", 13L -> "keep", 14L -> "keep"))
    assert(r(11L).getAs[Long]("n_earlier_dups") == 1L)
    assert(r(11L).getAs[Long]("rep_id") == 10L)
    assert(r(11L).getAs[Double]("max_dup_cos") > 0.999)
    // cluster geometry: 13 lands on the y anchor, 14 on the x anchor
    assert(r(13L).getAs[Long]("cluster") == 1L)
    assert(r(14L).getAs[Long]("cluster") == 0L)
    // survivors keep themselves as representative
    assert(r(10L).getAs[Long]("rep_id") == 10L)
  }

  test("q115 pair generation keys on the cluster id (no all-pairs join)") {
    val df = run("q115_semantic_dedup")
    df.collect()
    val plan = planOf(df)
    // the pair join is an EQUI-join on the cluster id (AQE may choose
    // broadcast at test scale; at corpus scale it hash-partitions on
    // the same key) — never a cartesian all-pairs shape. The one
    // nested-loop join allowed is assignToCentroids' ONE-ROW anchor
    // array broadcast (the documented crossJoin(broadcast(...)) form).
    assert(!plan.contains("CartesianProduct"), s"all-pairs join:\n$plan")
    val joins = physicalNodes(df).filter(_.nodeName.contains("Join"))
    assert(joins.exists(_.toString.contains("cluster")),
      s"expected a cluster-keyed equi-join, got: ${joins.map(_.nodeName)}")
  }

  // ---- q116 repeated n-grams -----------------------------------------

  test("q116 verdict ladder on a planted shared block") {
    import spark.implicits._
    val block = (1 to 5).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      // 10 words → 6 shingles, exactly 1 shared (the planted block)
      (1L, s"$block uniq1 uniq2 uniq3 uniq4 uniq5"),
      // the block verbatim → 1 shingle, all shared
      (2L, block),
      // fully unique → clean
      (3L, (1 to 10).map(i => s"only$i").mkString(" ")),
      // under k words → no shingles, absent from the report
      (4L, "tiny doc here"))
      .toDF("doc_id", "text")
    val r = Boilerplate.profile(docs, k = 5).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r.size == 3 && !r.contains(4L))
    assert(r(1L).getAs[String]("verdict") == "partial")
    assert(r(1L).getAs[Long]("n_shingles") == 6L)
    assert(r(1L).getAs[Long]("n_shared") == 1L)
    assert(r(2L).getAs[String]("verdict") == "boilerplate")
    assert(r(2L).getAs[Double]("shared_frac") == 1.0)
    assert(r(3L).getAs[String]("verdict") == "clean")
    assert(r(3L).getAs[Long]("n_shared") == 0L)
  }

  test("q116 repeated shingles INSIDE one doc do not count as shared") {
    import spark.implicits._
    // the same 5-gram appears twice within doc 1 and nowhere else:
    // per-doc array_distinct collapses it, so dfreq stays 1 → clean
    val block = (1 to 5).map(i => s"rep$i").mkString(" ")
    val docs = Seq((1L, s"$block $block")).toDF("doc_id", "text")
    val r = Boilerplate.profile(docs, k = 5).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("verdict") == "clean")
  }

  // ---- q117 hashed-feature classifier --------------------------------

  /** Independent reference: weight(f) = int(md5(f)[0:4], 16) − 32768. */
  private def refWeight(f: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(f.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 4)
    java.lang.Long.parseLong(hex, 16) - 32768L
  }

  test("q117 score matches an independent in-JVM md5-weight fold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),          // features: "alpha beta", "beta gamma"
      (2L, "a b a b"),                   // distinct features: "a b", "b a"
      (3L, "solo"))                      // 1 word → filtered out
      .toDF("doc_id", "text")
    val r = Classifier.score(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r.size == 2 && !r.contains(3L))
    val raw1 = refWeight("alpha beta") + refWeight("beta gamma")
    assert(r(1L).getAs[Long]("n_features") == 2L)
    assert(r(1L).getAs[Long]("raw") == raw1)
    assert(math.abs(r(1L).getAs[Double]("score") - raw1 / (2 * 32768.0)) < 1e-6)
    assert(r(1L).getAs[String]("verdict") == (if (raw1 > 0) "keep" else "flag"))
    val raw2 = refWeight("a b") + refWeight("b a")
    assert(r(2L).getAs[Long]("n_features") == 2L) // dup bigram deduped
    assert(r(2L).getAs[Long]("raw") == raw2)
  }

  // ---- q118 integer PageRank -----------------------------------------

  test("q118 PageRank matches the hand-computed star-graph fixed point") {
    import spark.implicits._
    // hub 1 ↔ leaves 2, 3 (symmetric). Hand-unrolled 3 steps in
    // micro-rank units with floor division:
    //   i1: hub 1_850_000, leaf 575_000
    //   i2: hub 1_127_500, leaf 936_250
    //   i3: hub 1_741_625, leaf 629_187  (85·563_750 // 100 floors .5)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = graft.operators.PageRank.ranks(edges, iters = 3).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("rank")).toMap
    assert(r == Map(1L -> 1741625L, 2L -> 629187L, 3L -> 629187L))
  }

  test("q118 PageRank holds the uniform fixed point on a regular graph") {
    import spark.implicits._
    // complete K3: outdeg 2 everywhere → every step returns exactly
    // 150_000 + 85% of 1_000_000 = 1_000_000 (the scale-free sanity
    // anchor: a regular graph must stay uniform under any #iters)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val r = graft.operators.PageRank.ranks(edges, iters = 4).collect()
      .map(x => x.getAs[Long]("rank")).toSet
    assert(r == Set(1000000L))
  }

  test("q118 PageRank differential vs a sequential reference on random graphs") {
    import spark.implicits._
    // fixed-seed random symmetric graphs; the distributed join-agg
    // loop must equal an independent sequential fold EXACTLY (integer
    // fixed-point arithmetic has no tolerance band)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 10
      val undirected = (for (_ <- 1 to n * 2) yield {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a == b) None else Some((a.min(b), a.max(b)))
      }).flatten.distinct
      val edges = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val got = graft.operators.PageRank.ranks(edges.toDF("src", "dst"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // sequential reference: adjacency fold in plain Scala
      val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var rank = out.keys.map(_ -> 1000000L).toMap
      for (_ <- 1 to 3) {
        val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for ((src, dsts) <- out; c = rank(src) / dsts.length; d <- dsts)
          contrib(d) += c
        rank = rank.keys.map(id => id -> (150000L + 85L * contrib(id) / 100L)).toMap
      }
      assert(got == rank, s"trial $trial (n=$n)")
    }
  }

  test("q115 anchor scaling holds per-vector candidate volume ~flat") {
    import spark.implicits._
    // the SemDeDup scale knob: anchors grow ∝ corpus, so cell
    // populations — and with them the per-vector quadratic pair work —
    // stay bounded. Fixed-seed random vectors, 4x corpus with 4x
    // anchors: pairs/vector must not grow beyond noise (uniform data:
    // E[pairs/vec] = (n/k - 1)/2 stays constant when k ∝ n).
    val rnd = new scala.util.Random(11)
    def vecs(n: Int) = (0 until n).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian()))).toDF("vec_id", "v")
    def pairsPerVec(n: Int, anchors: Int): Double = {
      val e = vecs(n)
      val anchorSet = e.filter(col("vec_id") < anchors)
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val assigned = graft.operators.Similarity
        .assignToCentroids(e, anchorSet, "vec_id", "v", "cid", "cv")
        .select(col("vec_id"), col("cell"))
      val cells = assigned.groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .collect().map(_.getLong(1))
      cells.map(c => c * (c - 1) / 2.0).sum / n
    }
    val small = pairsPerVec(400, 8)
    val large = pairsPerVec(1600, 32)
    assert(large < small * 1.5,
      s"pair volume per vector grew: $small -> $large (knob not engaged)")
  }

  test("q121 funnel is monotone and every stage does real work") {
    val rows = run("q121_curation_end2end").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val chain = Seq("n_input", "n_scored_keep", "n_not_boiler",
        "n_unique", "n_sampled").map(r.getAs[Long])
      assert(chain == chain.sorted.reverse,
        s"funnel not monotone for ${r.getAs[String]("source")}: $chain")
      assert(r.getAs[Long]("n_shards") <= r.getAs[Long]("n_sampled"))
    }
    // the gates that can fire on this corpus do fire (exact dedup
    // legitimately drops nothing downstream of the boilerplate gate:
    // identical texts share ALL shingles, so exact duplicates are a
    // subset of the boilerplate class and die one stage earlier —
    // the stage still guards pipelines whose dup docs are short)
    def total(c: String) = rows.map(_.getAs[Long](c)).sum
    assert(total("n_scored_keep") < total("n_input"))
    assert(total("n_not_boiler") < total("n_scored_keep"))
    assert(total("n_sampled") < total("n_unique"))
    assert(total("n_sampled") > 0L)
  }

  test("q117 is a pure projection: no hash exchange in the plan") {
    val plan = planOf(run("q117_classifier_score"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"q117 should shuffle only for the presentation sort:\n$plan")
  }
}
