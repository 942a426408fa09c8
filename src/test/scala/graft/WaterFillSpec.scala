package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.WaterFill

/** q270 max-min fair allocation: a hand-computed water level, the
  * exact-budget invariant on the real corpus, and saturation flags.
  */
class WaterFillSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def supply(rows: Seq[(String, Long)]) =
    spark.createDataFrame(
      rows.map { case (s, c) => Row(s, c) }.asJava,
      StructType.fromDDL("source STRING, cap BIGINT"))

  test("hand-computed water level: saturation, redistribution, remainder") {
    // caps (5, 10, 100, 100), B = 215 div 10 = 21. Level test: only
    // s1 saturates (5*4 = 20 <= 21); rem = 16 over 3 -> base 5,
    // extra 1 to the first unsaturated source in name order.
    val out = WaterFill.allocate(supply(Seq(
      "s1" -> 5L, "s2" -> 10L, "s3" -> 100L, "s4" -> 100L))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out("s1") === ((5L, 5L, 1L, 1000L)))
    assert(out("s2") === ((10L, 6L, 0L, 600L)))
    assert(out("s3") === ((100L, 5L, 0L, 50L)))
    assert(out("s4") === ((100L, 5L, 0L, 50L)))
  }

  test("the allocation sums to the budget exactly on the corpus") {
    val rows = run("q270_water_fill").collect()
    val totalSupply = rows.map(_.getLong(1)).sum
    val totalAlloc = rows.map(_.getLong(2)).sum
    assert(totalAlloc === totalSupply / 10)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"${r.getString(0)} over cap")
    }
  }

  test("equal caps split the budget within one unit") {
    val out = WaterFill.allocate(supply(Seq(
      "a" -> 100L, "b" -> 100L, "c" -> 100L))).collect()
    val allocs = out.map(_.getLong(2)).sorted
    assert(allocs.sum === 30L)
    assert(allocs.max - allocs.min <= 1)
  }
}
