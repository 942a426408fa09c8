package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.Freshness

/** q188 freshness audit: a planted silent-stop feed, the full-
  * coverage zero row, and the any-type-defines-the-day spine rule.
  */
class FreshnessSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def run(rows: Seq[(String, String)]) = {
    val df = spark.createDataFrame(
      rows.map { case (g, d) => Row(g, java.sql.Date.valueOf(d)) }.asJava,
      StructType.fromDDL("g STRING, day DATE"))
    Freshness.audit(df, "g", "day")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDate(4).toString, r.getLong(5))))
      .toMap
  }

  test("q188 silent stop: the dead feed shows missing days and staleness") {
    val rows = Seq(
      ("live", "2024-01-01"), ("live", "2024-01-02"),
      ("live", "2024-01-03"), ("live", "2024-01-04"),
      ("dead", "2024-01-01"), ("dead", "2024-01-02"))
    val out = run(rows)
    assert(out("live") == ((4L, 4L, 0L, "2024-01-04", 0L)))
    assert(out("dead") == ((4L, 2L, 2L, "2024-01-02", 2L)))
  }

  test("q188 full coverage: all zeros") {
    val rows = for (g <- Seq("a", "b"); d <- 1 to 3)
      yield (g, f"2024-02-0$d")
    val out = run(rows)
    assert(out("a") == ((3L, 3L, 0L, "2024-02-03", 0L)))
    assert(out("b") == ((3L, 3L, 0L, "2024-02-03", 0L)))
  }

  test("q188 spine: a day only ONE feed delivered is expected of all") {
    val rows = Seq(
      ("a", "2024-03-01"), ("a", "2024-03-02"),
      ("b", "2024-03-02"), ("b", "2024-03-03"))
    val out = run(rows)
    // both feeds expected on all 3 observed days; each missing one
    assert(out("a") == ((3L, 2L, 1L, "2024-03-02", 1L)))
    assert(out("b") == ((3L, 2L, 1L, "2024-03-03", 0L)))
  }

  test("q188 duplicate rows per (feed, day) do not inflate presence") {
    val rows = Seq.fill(5)(("a", "2024-04-01")) ++ Seq(("b", "2024-04-01"))
    val out = run(rows)
    assert(out("a") == ((1L, 1L, 0L, "2024-04-01", 0L)))
  }
}
