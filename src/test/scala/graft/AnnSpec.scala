package graft

/** Recall of the approximate ANN paths vs the exact q50 baseline.
  *
  * The testdata embeddings are uniform-random — the hostile case for
  * LSH/IVF (true neighbors sit at cos ≈ 0.35–0.5, where hyperplane
  * collision probability is low). Thresholds below are calibrated to
  * that regime; on clustered real-world embeddings both paths do far
  * better. The point of the spec is regression detection, not absolute
  * quality.
  */
class AnnSpec extends SparkSpec {

  private def topk(name: String): Map[Long, Seq[Long]] =
    run(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._3).map(_._2).toSeq
      }

  private lazy val exact = topk("q50_ann_bruteforce")

  private def recallAt10(approx: Map[Long, Seq[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      val got = approx.getOrElse(q, Seq.empty).toSet
      truth.count(got).toDouble / truth.size
    }
    per.sum / per.size
  }

  test("q50 returns 10 neighbors per query, self excluded") {
    assert(exact.nonEmpty)
    for ((q, ns) <- exact) {
      assert(ns.size == 10, s"query $q has ${ns.size} neighbors")
      assert(!ns.contains(q), s"query $q returned itself")
    }
  }

  test("q51 LSH recall@10 vs exact >= 0.35 on uniform-random vectors") {
    val r = recallAt10(topk("q51_ann_lsh"))
    info(f"q51 recall@10 = $r%.3f")
    assert(r >= 0.35, f"q51 recall $r%.3f below floor")
  }

  test("q52 IVF recall@10 vs exact >= 0.35 on uniform-random vectors") {
    val r = recallAt10(topk("q52_centroid_ivf"))
    info(f"q52 recall@10 = $r%.3f")
    assert(r >= 0.35, f"q52 recall $r%.3f below floor")
  }
}
