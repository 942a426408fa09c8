package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.queries.KmvSketch

/** q187 KMV retention: exactness below the sketch size, the 3/√K
  * error envelope against exact retention on the orders frame, and
  * union-dedup correctness (a retained key counts once).
  */
class KmvSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def frame(rows: Seq[(Long, Long)]) =
    spark.createDataFrame(
      rows.map { case (p, u) => Row(p, u) }.asJava,
      StructType.fromDDL("mk LONG, u LONG"))

  test("q187 months smaller than K are estimated exactly") {
    // 2 months, 100 and 80 users, 50 retained — all below K=256
    val m1 = (1L to 100L).map(u => (1L, u))
    val m2 = (51L to 130L).map(u => (2L, u))
    val out = KmvSketch.retention(frame(m1 ++ m2), "mk", "u")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 1)
    val (mk, active, retained) = out.head
    assert(mk == 2L && active == 80.0 && retained == 50.0)
  }

  test("q187 estimates land inside the 3/sqrt(K) envelope on real months") {
    val orders = tables.orders.select(
      (org.apache.spark.sql.functions.year(col("o_orderdate")) * 12 +
        org.apache.spark.sql.functions.month(col("o_orderdate"))).as("mk"),
      col("o_custkey").as("u"))
    val est = KmvSketch.retention(orders, "mk", "u")
      .collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    val exact = graft.queries.BitmapAlgebra.retention(orders, "mk", "u")
      .collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getAs[Number](1).longValue, r.getAs[Number](2).longValue))).toMap
    assert(est.keySet == exact.keySet)
    // 4/sqrt(K), NOT 3: this asserts EVERY month (a max over ~80
    // samples of a ~1/sqrt(K)-sigma estimator), and the expected max
    // of 80 gaussians is ~2.7 sigma — a 3-sigma gate flakes on ~1 in
    // 5 data realizations (observed 3.1 sigma on the round-13 regen);
    // 4 sigma holds with P(trip) ~ 0.25% while still catching a
    // broken sketch outright
    val eps = 4.0 / math.sqrt(256.0) // ~0.25 relative
    est.foreach { case (mk, (a, r)) =>
      val (ae, re) = exact(mk)
      assert(math.abs(a - ae) <= math.max(eps * ae, 3.0), s"mk=$mk active $a vs $ae")
      // retained stacks three estimates — allow the envelope on the
      // LARGER of the union operands, plus the same small-count floor
      val slack = math.max(3 * eps * math.max(ae, re.toDouble + 1), 6.0)
      assert(math.abs(r - re) <= slack, s"mk=$mk retained $r vs $re")
    }
  }

  test("q187 union dedups: identical months retain everything") {
    val m = (1L to 400L) // above K so the sketch path is exercised
    val rows = m.map(u => (1L, u)) ++ m.map(u => (2L, u))
    val out = KmvSketch.retention(frame(rows), "mk", "u")
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).head
    // A = B ⇒ union = A ⇒ retained estimate = active estimate exactly
    assert(out._1 == out._2)
  }
}
