package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{Silhouette, StratifiedAte, Systematic}

/** q239 systematic sampling, q240 stratified ATE, q241 silhouette:
  * exact-count invariants, confounding removal, and cluster-geometry
  * closed forms.
  */
class DesignSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.functions._

  // ---- q239 -------------------------------------------------------

  private def sized(rows: Seq[(Long, String, Long)]) =
    spark.createDataFrame(
      rows.map { case (id, src, n) => Row(id, src, n) }.asJava,
      StructType.fromDDL("doc_id BIGINT, source STRING, n_chars BIGINT"))

  test("q239 selects exactly ceil(m/8) rows for every residue of m") {
    val d = sized((1 to 8).flatMap { k =>
      val m = 8 * 3 + k // m in 25..32 covers all residues
      (1 to m).map(i => ((k * 1000 + i).toLong, s"s$k", 10L))
    })
    val out = Systematic.sample(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    (1 to 8).foreach { k =>
      val m = 24L + k
      val t = (m + 7) / 8
      assert(out(s"s$k") == ((m, t, t)),
        s"source s$k: got ${out(s"s$k")}, want ($m, $t, $t)")
    }
  }

  test("q239 stride is even: gaps between selected ranks differ by at most one") {
    val m = 103
    val d = sized((1 to m).map(i => (i.toLong, "s", 1L)))
    // recompute the picks inline to inspect spacing
    val t = (m + 7) / 8
    val picks = (1 to m).filter(r =>
      (r.toLong * t) / m > ((r - 1).toLong * t) / m)
    assert(picks.length == t)
    val gaps = picks.zip(picks.tail).map { case (a, b) => b - a }
    assert(gaps.max - gaps.min <= 1, s"uneven stride: $gaps")
  }

  // ---- q240 -------------------------------------------------------

  test("q240 removes planted segment confounding that biases the naive diff") {
    // two segments with very different base spend; exposure heavily
    // skewed toward the high-spend segment. True effect is exactly 0
    // (treatment does nothing). Build customers whose md5 keys land
    // them treated/control by scanning candidate ids.
    import org.apache.spark.sql.functions.{col => c}
    val thrHigh = 4294967296L * 9 / 10 // HIGH segment: 90% treated
    val thrLow = 4294967296L / 10      // LOW segment: 10% treated
    def u32(id: Long): Long =
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
          .substring(0, 8), 16)
    // pick 40 ids per (segment, arm) deterministically
    val highIds = (1L to 4000L).filter(i => u32(i) < thrHigh).take(30) ++
      (1L to 4000L).filter(i => u32(i) >= thrHigh).take(10)
    val lowIds = (4001L to 12000L).filter(i => u32(i) < thrLow).take(10) ++
      (4001L to 12000L).filter(i => u32(i) >= thrLow).take(30)
    val cust = spark.createDataFrame(
      (highIds.map(i => Row(i, "HIGH")) ++ lowIds.map(i => Row(i, "LOW"))).asJava,
      StructType.fromDDL("c_custkey BIGINT, c_mktsegment STRING"))
    // spend depends ONLY on segment: HIGH=1000, LOW=100
    val orders = spark.createDataFrame(
      (highIds.map(i => Row(i, 1000.0)) ++ lowIds.map(i => Row(i, 100.0))).asJava,
      StructType.fromDDL("o_custkey BIGINT, o_totalprice DOUBLE"))
    val thr = when(c("c_mktsegment") === "HIGH", lit(thrHigh))
      .otherwise(lit(thrLow))
    val out = StratifiedAte.ate(cust, orders, thr).collect()
    val naive = out.head.getDouble(5)
    val ate = out.head.getDouble(6)
    assert(ate == 0.0, s"stratified ATE must be exactly 0, got $ate")
    assert(math.abs(naive) > 100.0,
      s"naive diff should be badly confounded, got $naive")
    out.foreach(r => assert(r.getDouble(4) == 0.0,
      s"within-stratum diff must be 0: $r"))
  }

  // ---- q241 -------------------------------------------------------

  private def vecs(rows: Seq[(Long, Int, Seq[Double])]) =
    spark.createDataFrame(
      rows.map { case (id, l, v) => Row(id, l, v) }.asJava,
      StructType.fromDDL("vec_id BIGINT, label INT, v ARRAY<DOUBLE>"))

  test("q241 two tight far-apart clusters score near 1; a planted mislabel goes negative") {
    val a = Seq((1L, 1, Seq(0.0, 0.0)), (2L, 1, Seq(0.5, 0.0)),
      (3L, 2, Seq(100.0, 0.0)), (4L, 2, Seq(100.5, 0.0)),
      // vector labeled 1 sitting inside cluster 2:
      (5L, 1, Seq(100.25, 0.0)))
    val out = Silhouette.silhouette(vecs(a)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out(2)._1 == 2L && out(2)._3 == 0L)
    assert(out(2)._2 > 0.99, s"separated cluster must score near 1: ${out(2)}")
    assert(out(1)._3 == 1L, "the planted mislabel must be counted negative")
  }

  test("q241 symmetric two-point clusters match the closed form") {
    // labels at {0} and {d}: each vector IS its centroid -> a = 0,
    // b = d -> s = 1 exactly for all vectors
    val out = Silhouette.silhouette(vecs(Seq(
      (1L, 1, Seq(0.0)), (2L, 2, Seq(8.0))))).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(1) == 1.0 && out(2) == 1.0, s"got $out")
  }
}
