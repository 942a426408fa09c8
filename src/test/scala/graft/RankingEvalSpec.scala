package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.RankingEval

/** q175 NDCG@k evaluation: textbook DCG arithmetic on hand-built
  * rankings, the perfect/inverted contrast, presented-list IDCG, and
  * the empty-holdout guard.
  */
class RankingEvalSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def frame(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  private def eval(ranked: Seq[(String, Long, Int)], truth: Seq[(String, Long)]) =
    RankingEval.ndcgAtK(
      frame("key STRING, item LONG, rk INT")(
        ranked.map { case (k, i, r) => Row(k, i, r) }),
      frame("key STRING, item LONG")(
        truth.map { case (k, i) => Row(k, i) }))
      .collect()
      .map(r => r.getAs[String]("key") -> r)
      .toMap

  private def w(i: Int): Double = 1.0 / (math.log(i + 1.0) / math.log(2.0))

  test("q175 perfect ranking has ndcg = 1, inverted ranking is strictly worse") {
    // key p: both relevant items ranked 1-2 of 3; key q: same items at 2-3
    val out = eval(
      Seq(("p", 1L, 1), ("p", 2L, 2), ("p", 3L, 3),
        ("q", 3L, 1), ("q", 1L, 2), ("q", 2L, 3)),
      Seq(("p", 1L), ("p", 2L), ("q", 1L), ("q", 2L)))
    assert(out("p").getAs[Double]("ndcg") == 1.0)
    val q = out("q").getAs[Double]("ndcg")
    assert(q > 0 && q < 1.0)
    assert(out("p").getAs[Long]("hits") == 2L)
    assert(out("q").getAs[Double]("recall") == 1.0)
  }

  test("q175 dcg matches the hand-computed discount sum") {
    // relevant at ranks 1 and 3: dcg = w(1) + w(3); idcg = w(1) + w(2)
    val out = eval(
      Seq(("k", 10L, 1), ("k", 11L, 2), ("k", 12L, 3)),
      Seq(("k", 10L), ("k", 12L)))
    val r = out("k")
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(r.getAs[Double]("dcg") == (q6(w(1)) + q6(w(3))).toDouble)
    assert(r.getAs[Double]("idcg") == (q6(w(1)) + q6(w(2))).toDouble)
    assert(r.getAs[Double]("precision_at_k") == 2.0 / 3.0)
  }

  test("q175 idcg truncates to the presented list when holdout is larger") {
    // 2 presented rows, 3 relevant items: idcg = w(1) + w(2) only
    val out = eval(
      Seq(("k", 1L, 1), ("k", 2L, 2)),
      Seq(("k", 1L), (("k"), 7L), ("k", 8L)))
    val r = out("k")
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(r.getAs[Double]("idcg") == (q6(w(1)) + q6(w(2))).toDouble)
    assert(r.getAs[Long]("n_test") == 3L)
    assert(r.getAs[Double]("recall") == 1.0 / 3.0)
  }

  test("q175 empty holdout guards ndcg and recall to NULL") {
    val out = eval(Seq(("k", 1L, 1), ("k", 2L, 2)), Seq(("other", 1L)))
    val r = out("k")
    assert(r.isNullAt(r.fieldIndex("ndcg")))
    assert(r.isNullAt(r.fieldIndex("recall")))
    assert(r.getAs[Long]("hits") == 0L)
    assert(r.getAs[Double]("precision_at_k") == 0.0)
  }

  // ---- q189 MRR / MAP@K ----

  private def eval189(ranked: Seq[(String, Long, Int)], truth: Seq[(String, Long)]) =
    RankingEval.mrrMapAtK(
      frame("key STRING, item LONG, rk INT")(
        ranked.map { case (k, i, r) => Row(k, i, r) }),
      frame("key STRING, item LONG")(
        truth.map { case (k, i) => Row(k, i) }))
      .collect()
      .map(r => r.getAs[String]("key") -> r)
      .toMap

  private def q6d(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("q189 textbook AP: hits at ranks 1 and 3 of R=2") {
    // prec@1 = 1/1, prec@3 = 2/3; AP = (1 + 2/3) / 2; RR = 1
    val out = eval189(
      Seq(("k", 1L, 1), ("k", 2L, 2), ("k", 3L, 3)),
      Seq(("k", 1L), ("k", 3L)))
    val r = out("k")
    assert(r.getAs[Double]("rr") == 1.0)
    assert(r.getAs[Int]("first_hit_rank") == 1)
    assert(r.getAs[Double]("ap_at_k") ==
      (q6d(1.0) + q6d(2.0 / 3.0)).toDouble / 2.0)
  }

  test("q189 first hit deep in the list: rr = 1/rank") {
    val out = eval189(
      Seq(("k", 1L, 1), ("k", 2L, 2), ("k", 3L, 3), ("k", 4L, 4)),
      Seq(("k", 4L)))
    val r = out("k")
    assert(r.getAs[Double]("rr") == 0.25)
    assert(r.getAs[Double]("ap_at_k") == q6d(0.25).toDouble)
  }

  test("q189 no hits with a real holdout: rr = 0, ap = 0; empty holdout: NULL") {
    val out = eval189(
      Seq(("k", 1L, 1), ("k", 2L, 2), ("m", 9L, 1)),
      Seq(("k", 7L), ("other", 1L)))
    val k = out("k")
    assert(k.getAs[Double]("rr") == 0.0 && k.getAs[Double]("ap_at_k") == 0.0)
    assert(k.isNullAt(k.fieldIndex("first_hit_rank")))
    val m = out("m")
    assert(m.isNullAt(m.fieldIndex("rr")))
    assert(m.isNullAt(m.fieldIndex("ap_at_k")))
  }

  test("q189 perfect ranking of all R items: ap = 1") {
    val out = eval189(
      Seq(("k", 1L, 1), ("k", 2L, 2), ("k", 3L, 3)),
      Seq(("k", 1L), ("k", 2L), ("k", 3L)))
    assert(out("k").getAs[Double]("ap_at_k") == 1.0)
  }

  test("q189 normalizer is min(R, K): R beyond the list doesn't dilute below the cap") {
    // K defaults to 10; list of 2, R = 3 -> normalizer 3 (= min(3, 10))
    val out = eval189(
      Seq(("k", 1L, 1), ("k", 2L, 2)),
      Seq(("k", 1L), ("k", 2L), ("k", 7L)))
    val r = out("k")
    assert(r.getAs[Double]("ap_at_k") ==
      (q6d(1.0) + q6d(1.0)).toDouble / 3.0)
  }
}
