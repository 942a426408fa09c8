package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{Bollinger, GrowthAccounting, RollingDistinct}

/** Behavioral checks for q168 (Bollinger bands) and q169 (growth
  * accounting): a flat-then-spike series where exactly the spike
  * breaks out, head-NULL bands, the adaptive width contrast, a
  * hand-built user story crossing every growth state, and the
  * n_active decomposition identity.
  */
class FlowSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // ---- q168: Bollinger ----

  private def series(vals: Seq[Long]) =
    Bollinger.bands(
      df("k STRING, d LONG, n LONG")(
        vals.zipWithIndex.map { case (v, i) => Row("a", i + 1L, v) }),
      "k", "d", "n").orderBy("d").collect()

  test("q168 head days have NULL bands and no flag") {
    val out = series(Seq(10L, 10L, 10L, 10L))
    assert(out(0).isNullAt(out(0).fieldIndex("mid")))
    assert(out(0).getAs[String]("breakout") == null)
    assert(out(1).isNullAt(out(1).fieldIndex("mid")))
    assert(!out(2).isNullAt(out(2).fieldIndex("mid"))) // 3rd day: k = 3
  }

  test("q168 spike above a quiet baseline flags 'above', neighbors stay inside") {
    // low-noise baseline 10/11 alternating, then a 100 spike
    val out = series(Seq(10L, 11L, 10L, 11L, 10L, 11L, 100L, 10L))
    val byDay = out.map(r => r.getAs[Long]("d") -> r.getAs[String]("breakout")).toMap
    assert(byDay(7L) == "above")
    assert(byDay(5L) == "inside" && byDay(6L) == "inside")
  }

  test("q168 noisy series needs a bigger spike: adaptive width") {
    // same +30 step: flags on the quiet series, stays inside on the noisy one
    val quiet = series(Seq(10L, 11L, 10L, 11L, 10L, 11L, 40L))
    val noisyRows = Seq(10L, 40L, 5L, 35L, 8L, 38L, 40L)
    val noisy = series(noisyRows)
    assert(quiet.last.getAs[String]("breakout") == "above")
    assert(noisy.last.getAs[String]("breakout") == "inside")
  }

  // ---- q169: growth accounting ----

  test("q169 one user crossing every state, dormancy charged to the first silent week") {
    def d(w: Int) = Date.valueOf(java.time.LocalDate.ofEpochDay(w * 7L + 1))
    // u1 active weeks 100,101,103 (new, retained, resurrected; dormant at 102)
    // u2 active week 101 only (new at 101; dormant at 102)
    // u3 active 100..104 keeps the panel wide so week edges exist
    val rows =
      Seq(100, 101, 103).map(w => Row(1L, d(w))) ++
        Seq(Row(2L, d(101))) ++
        (100 to 104).map(w => Row(3L, d(w)))
    val out = GrowthAccounting.flows(df("u LONG, day DATE")(rows), "u", "day")
      .collect().map(r => r.getAs[Long]("week") -> r).toMap
    assert(out(100L).getAs[Long]("n_new") == 2L)       // u1, u3
    assert(out(101L).getAs[Long]("n_new") == 1L)       // u2
    assert(out(101L).getAs[Long]("n_retained") == 2L)  // u1, u3
    assert(out(102L).getAs[Long]("n_dormant") == 2L)   // u1, u2 went silent
    assert(out(103L).getAs[Long]("n_resurrected") == 1L) // u1 returns
    assert(out(104L).getAs[Long]("n_dormant") == 1L)   // u1 silent again
    // nobody is dormant past the observation end
    assert(!out.contains(105L))
  }

  test("q169 n_active decomposes exactly into new + retained + resurrected") {
    def d(i: Int) = Date.valueOf(f"2024-01-${i}%02d")
    val rnd = new scala.util.Random(169)
    val rows = Seq.tabulate(200)(_ => Row(rnd.nextInt(20).toLong, d(1 + rnd.nextInt(28))))
    val out = GrowthAccounting.flows(df("u LONG, day DATE")(rows), "u", "day").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") +
          r.getAs[Long]("n_resurrected"))
    }
  }

  // ---- q173: rolling distinct actives ----

  private def actives(rows: Seq[(Long, Int)]) = {
    def d(i: Int) = Date.valueOf(f"2024-03-${i}%02d")
    RollingDistinct.trailingActives(
      df("u LONG, day DATE")(rows.map { case (u, i) => Row(u, d(i)) }),
      "u", "day", 7)
      .collect()
      .map(r => r.getAs[Date]("day").toString.takeRight(2).toInt ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Double]("stickiness"))))
      .toMap
  }

  test("q173 window edge: day 8 forgets day 1, day 7 still sees it") {
    val out = actives(Seq((1L, 1), (2L, 7), (2L, 8)))
    assert(out(7) == ((1L, 2L, 0.5))) // u1 (day 1) still in the trailing 7
    assert(out(8) == ((1L, 1L, 1.0))) // day 1 aged out
  }

  test("q173 returning user counts once in the window") {
    val out = actives(Seq((1L, 3), (1L, 4), (1L, 5), (2L, 5)))
    assert(out(5) == ((2L, 2L, 1.0))) // u1 thrice-active collapses to 1
    assert(out(3) == ((1L, 1L, 1.0))) // isolated day: DAU = WAU
  }

  test("q173 only observed days are emitted and DAU <= WAU everywhere") {
    val out = actives(Seq((1L, 1), (1L, 20), (2L, 20), (3L, 21)))
    assert(out.keySet == Set(1, 20, 21)) // no spine days between bursts
    out.values.foreach { case (dau, wau, _) => assert(dau <= wau) }
    assert(out(21) == ((1L, 3L, 1.0 / 3.0)))
  }
}
