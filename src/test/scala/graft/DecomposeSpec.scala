package graft

import java.sql.Date
import java.time.LocalDate

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.det
import graft.queries.Decompose

/** q209 additive seasonal decomposition: a pure weekly signal is
  * recovered exactly (strength 1), a flat series decomposes to zeros
  * with a NULL strength guard, and the seasonal indices re-center.
  */
class DecomposeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def daily(rows: Seq[(LocalDate, Double)]) =
    spark.createDataFrame(
      rows.map { case (d, y) => Row(Date.valueOf(d), y) }.asJava,
      StructType.fromDDL("day DATE, y DOUBLE"))

  private def run(rows: Seq[(LocalDate, Double)]) =
    Decompose.decompose(daily(rows), col("day"),
      col("y").cast(det.D20_6)).collect()
      .map(r => r.getAs[Int]("dow") ->
        ((r.getAs[Long]("n_days"), r.getAs[Double]("seasonal"),
          Option(r.get(r.fieldIndex("seasonal_strength")))
            .map(_.asInstanceOf[Double]))))
      .toMap

  private val start = LocalDate.of(2024, 1, 1) // a Monday

  test("q209 pure weekly signal: seasonal recovered exactly, strength 1") {
    // s by position-in-week: Monday=0, Tue=7, ..., Sunday=42; base 100
    val s = (0 until 7).map(_ * 7.0)
    val rows = (0 until 35).map(i => (start.plusDays(i), 100.0 + s(i % 7)))
    val out = run(rows)
    // mean seasonal level is 21; Monday (Spark dow=2) should be 0-21
    assert(out(2)._2 == 0.0 - 21.0)
    assert(out(1)._2 == 42.0 - 21.0) // Sunday carries s=42
    assert(out.values.map(_._2).sum.abs < 1e-9)
    out.values.foreach { case (_, _, st) => assert(st.contains(1.0)) }
  }

  test("q209 flat series: zero seasonal everywhere, strength NULL-guarded") {
    val rows = (0 until 28).map(i => (start.plusDays(i), 5.0))
    val out = run(rows)
    assert(out.size == 7)
    out.values.foreach { case (_, si, st) =>
      assert(si == 0.0)
      assert(st.isEmpty)
    }
  }

  test("q209 series edges are excluded: n_days drops the 3-day margins") {
    val rows = (0 until 21).map(i => (start.plusDays(i), i.toDouble))
    val out = run(rows)
    // 21 days -> 15 interior days
    assert(out.values.map(_._1).sum == 15L)
  }

  test("q209 seasonal indices re-center to ~zero on a noisy series") {
    val rows = (0 until 63).map(i =>
      (start.plusDays(i), 50.0 + (i % 7) * 3.0 + (i % 5).toDouble))
    val out = run(rows)
    assert(out.values.map(_._2).sum.abs < 1e-4)
    out.values.foreach { case (_, _, st) =>
      assert(st.exists(v => v >= 0.0 && v <= 1.0))
    }
  }
}
