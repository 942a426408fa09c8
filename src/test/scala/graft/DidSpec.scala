package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.queries.Did

/** q181 difference-in-differences: hand-computed 2×2 panel, the
  * parallel-trend cancellation identity (did = 0 when both arms move
  * by the same amount), and the empty-cell NULL guard.
  */
class DidSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def run(rows: Seq[(String, Boolean, Boolean, Long)]) = {
    val df = spark.createDataFrame(
      rows.map { case (g, t, p, v) => Row(g, t, p, v) }.asJava,
      StructType.fromDDL("g STRING, t BOOLEAN, p BOOLEAN, v LONG"))
    Did.did(df, "g", col("t"), col("p"), col("v"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
  }

  test("q181 hand-computed 2x2: did = (12-10) - (6-5) = 1") {
    val rows = Seq(
      // treated pre mean 10, post mean 12; control pre 5, post 6
      ("s", true, false, 9L), ("s", true, false, 11L),
      ("s", true, true, 12L),
      ("s", false, false, 5L),
      ("s", false, true, 4L), ("s", false, true, 8L))
    val r = run(rows)("s")
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L) // n_t_pre, n_t_post
    assert(r.getLong(3) == 1L && r.getLong(4) == 2L) // n_c_pre, n_c_post
    assert(r.getDouble(5) == 10.0 && r.getDouble(6) == 12.0)
    assert(r.getDouble(7) == 5.0 && r.getDouble(8) == 6.0)
    assert(r.getDouble(9) == 1.0)
  }

  test("q181 parallel trend cancels: both arms +3 means did = 0") {
    val rows = Seq(
      ("s", true, false, 10L), ("s", true, true, 13L),
      ("s", false, false, 20L), ("s", false, true, 23L))
    assert(run(rows)("s").getDouble(9) == 0.0)
  }

  test("q181 empty cell nulls the estimate instead of faking a 0 arm") {
    val rows = Seq( // no control-post observations
      ("s", true, false, 10L), ("s", true, true, 13L),
      ("s", false, false, 20L))
    val r = run(rows)("s")
    assert(r.getLong(4) == 0L)     // n_c_post
    assert(r.isNullAt(8))          // avg_c_post
    assert(r.isNullAt(9))          // did
  }

  test("q181 groups are independent") {
    val rows = Seq(
      ("a", true, false, 10L), ("a", true, true, 15L),
      ("a", false, false, 10L), ("a", false, true, 10L),
      ("b", true, false, 10L), ("b", true, true, 10L),
      ("b", false, false, 10L), ("b", false, true, 18L))
    val out = run(rows)
    assert(out("a").getDouble(9) == 5.0)
    assert(out("b").getDouble(9) == -8.0)
  }
}
