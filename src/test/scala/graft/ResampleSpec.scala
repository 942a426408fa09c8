package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{BitmapDistinct, Journeys, Resample}

/** Behavioral checks for q162 (bitmap-exact distinct), q163 (linear
  * resample), and q164 (top journeys): bucket-boundary keys, bitmap ≡
  * count_distinct on adversarial key sets, the exact midpoint and
  * on-observation interpolation hits, the no-extrapolation edge, and
  * prefix truncation with deterministic ranks.
  */
class ResampleSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // ---- q162: bitmap distinct ----

  test("q162 bitmap path equals count_distinct across bucket boundaries") {
    // keys straddling the 32768 bucket edge, plus 0 and duplicates
    val keys = Seq(0L, 1L, 2L, 32767L, 32768L, 32769L, 65536L, 65537L,
      1L, 32768L, 100000L)
    val out = BitmapDistinct.bitmapDistinct(
      df("g STRING, k LONG")(keys.map(Row("a", _))), "g", "k").collect().head
    assert(out.getAs[Long]("n_distinct") == keys.distinct.length.toLong)
    assert(out.getAs[Long]("n_buckets") >= 2L)
  }

  test("q162 groups are independent and exact on a random key set") {
    val rnd = new scala.util.Random(162)
    val rows = Seq.tabulate(2000)(_ =>
      Row(if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(100000).toLong))
    val out = BitmapDistinct.bitmapDistinct(df("g STRING, k LONG")(rows), "g", "k")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("n_distinct")).toMap
    val expect = rows.groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).distinct.length.toLong }
    assert(out == expect)
  }

  // ---- q163: linear resample ----

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val DaySec = 86400L

  test("q163 exact midpoint interpolation") {
    // obs at day0 18:00 = 10, day1 06:00 = 30 → midnight day1 = 20
    val rows = Seq(
      Row("u", ts(18L * 3600), 10.0),
      Row("u", ts(DaySec + 6L * 3600), 30.0))
    val out = Resample.daily(df("k STRING, t TIMESTAMP, v DOUBLE")(rows),
      "k", "t", "v").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("value_interp") == 20.0)
  }

  test("q163 grid instant landing ON an observation takes it verbatim") {
    val rows = Seq(
      Row("u", ts(0L), 42.0),             // exactly midnight day 0
      Row("u", ts(DaySec / 2), 99.0))
    val out = Resample.daily(df("k STRING, t TIMESTAMP, v DOUBLE")(rows),
      "k", "t", "v").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("value_interp") == 42.0)
  }

  test("q163 no extrapolation outside the observed span") {
    // obs only on day 5 afternoon → day-5 midnight has no prev → empty
    val rows = Seq(Row("u", ts(5 * DaySec + 50000L), 7.0))
    val out = Resample.daily(df("k STRING, t TIMESTAMP, v DOUBLE")(rows),
      "k", "t", "v")
    assert(out.count() == 0L)
  }

  test("q163 weights by time, not by observation count") {
    // obs day0 12:00 = 0, then a cluster near day1 23:00 = 100:
    // midnight day1 interpolates on the 0↔first-cluster segment only
    val rows = Seq(
      Row("u", ts(12L * 3600), 0.0),
      Row("u", ts(DaySec + 82800L), 100.0),  // day1 23:00
      Row("u", ts(DaySec + 82801L), 100.0),
      Row("u", ts(DaySec + 82802L), 100.0))
    val out = Resample.daily(df("k STRING, t TIMESTAMP, v DOUBLE")(rows),
      "k", "t", "v").collect()
    assert(out.length == 1)
    val v = out.head.getAs[Double]("value_interp")
    // midnight day1 is 12h past obs0 of a 35h segment: v = 100*12/35
    assert(math.abs(v - 100.0 * (12.0 * 3600) / (35.0 * 3600 + 1)) < 0.1)
  }

  // ---- q164: journeys ----

  test("q164 prefix truncates at 3, short days keep their full path") {
    def r(u: Long, sec: Long, id: Long, t: String) = Row(u, ts(sec), id, t)
    val rows = Seq(
      r(1, 10, 1, "view"), r(1, 20, 2, "click"), r(1, 30, 3, "purchase"),
      r(1, 40, 4, "error"), // 4th event of the day — truncated away
      r(2, 10, 5, "view"), r(2, 20, 6, "click"), r(2, 30, 7, "purchase"),
      r(3, 10, 8, "signup")) // short day
    val out = Journeys.top(
      df("user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")(rows),
      "user_id", "ts", "event_id", "event_type").collect()
    val byJourney = out.map(r2 => r2.getAs[String]("journey") ->
      (r2.getAs[Long]("n_sessions"), r2.getAs[Long]("rank"))).toMap
    assert(byJourney("view>click>purchase") == ((2L, 1L)))
    assert(byJourney("signup")._1 == 1L)
    assert(!byJourney.keys.exists(_.contains("error")))
  }

  test("q164 count ties rank by journey string ascending") {
    def r(u: Long, sec: Long, id: Long, t: String) = Row(u, ts(sec), id, t)
    val rows = Seq(r(1, 10, 1, "b"), r(2, 10, 2, "a"))
    val out = Journeys.top(
      df("user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")(rows),
      "user_id", "ts", "event_id", "event_type").orderBy("rank").collect()
    assert(out.map(_.getAs[String]("journey")).toSeq == Seq("a", "b"))
  }
}
