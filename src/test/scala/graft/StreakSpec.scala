package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{Growth, Islands}

/** Behavioral checks for q148 (gaps-and-islands streaks) and q149
  * (MoM/YoY growth): hand-built streak shapes (single run, split
  * runs, tie-for-longest earliest-start), duplicate-day idempotence,
  * exact doubling/halving ratios, and missing-period NULLs.
  */
class StreakSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  private def d(day: Int) = Date.valueOf(f"2024-01-$day%02d")

  private def run(days: Seq[(String, Int)]) =
    Islands.streaks(
      df("k STRING, day DATE")(days.map { case (k, v) => Row(k, d(v)) }),
      "k", "day")
      .collect().map(r => r.getAs[String]("k") -> r).toMap

  // ---- q148: gaps and islands ----

  test("q148 one unbroken run is one island") {
    val out = run(Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4)))("a")
    assert(out.getAs[Long]("n_islands") == 1L)
    assert(out.getAs[Long]("longest_streak") == 4L)
    assert(out.getAs[Long]("n_active_days") == 4L)
    assert(out.getAs[Date]("longest_start") == d(1))
  }

  test("q148 a gap splits islands; longest wins") {
    // runs: 1-2 (len 2), 5-7 (len 3), 9 (len 1)
    val out = run(Seq(("a", 1), ("a", 2), ("a", 5), ("a", 6), ("a", 7), ("a", 9)))("a")
    assert(out.getAs[Long]("n_islands") == 3L)
    assert(out.getAs[Long]("longest_streak") == 3L)
    assert(out.getAs[Date]("longest_start") == d(5))
    assert(out.getAs[Long]("n_active_days") == 6L)
  }

  test("q148 tie for longest resolves to the EARLIEST start") {
    // runs: 1-2 and 5-6, both len 2
    val out = run(Seq(("a", 1), ("a", 2), ("a", 5), ("a", 6)))("a")
    assert(out.getAs[Long]("longest_streak") == 2L)
    assert(out.getAs[Date]("longest_start") == d(1))
  }

  test("q148 duplicate activity rows on one day count once") {
    val out = run(Seq(("a", 1), ("a", 1), ("a", 2), ("a", 2)))("a")
    assert(out.getAs[Long]("n_active_days") == 2L)
    assert(out.getAs[Long]("n_islands") == 1L)
  }

  test("q148 keys are independent") {
    val out = run(Seq(("a", 1), ("b", 2), ("a", 3)))
    assert(out("a").getAs[Long]("n_islands") == 2L)
    assert(out("b").getAs[Long]("n_islands") == 1L)
  }

  // ---- q149: growth ----

  test("q149 exact doubling and halving; head rows NULL") {
    val monthly = df("month DATE, revenue DOUBLE")(Seq(
      Row(Date.valueOf("2024-01-01"), 100.0),
      Row(Date.valueOf("2024-02-01"), 200.0),
      Row(Date.valueOf("2024-03-01"), 100.0)))
    val out = Growth.growth(monthly, "month", "revenue").orderBy("month").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("mom")))
    assert(out(1).getAs[Double]("mom") == 1.0)
    assert(out(2).getAs[Double]("mom") == -0.5)
    assert(out.forall(_.isNullAt(out(0).fieldIndex("yoy")))) // < 13 months
  }

  test("q149 yoy pairs month 13 with month 1") {
    val rows = (0 until 13).map { i =>
      Row(Date.valueOf(f"${2023 + (i / 12)}%d-${i % 12 + 1}%02d-01"), 100.0 + i)
    }
    val out = Growth.growth(df("month DATE, revenue DOUBLE")(rows), "month", "revenue")
      .orderBy("month").collect()
    assert(out.last.getAs[Double]("yoy") == 0.12) // 112/100 - 1
  }
}
