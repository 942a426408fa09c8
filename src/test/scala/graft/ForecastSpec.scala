package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.Forecast

/** q185 seasonal-naive/MASE: pure period-7 series (MASE = 0), trend
  * series (MASE > 1), the short-series guard, the all-flat zero-MAE₁
  * NULL guard, and a brute-force random differential.
  */
class ForecastSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def run(series: Seq[(String, Long, Long)]) = {
    val df = spark.createDataFrame(
      series.map { case (g, d, v) => Row(g, d, v) }.asJava,
      StructType.fromDDL("g STRING, d LONG, v LONG"))
    Forecast.mase(df, "g", "d", "v")
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
  }

  private def mk(g: String, vs: Seq[Long]) =
    vs.zipWithIndex.map { case (v, i) => (g, i.toLong, v) }

  test("q185 pure period-7 signal: seasonal MAE 0, MASE 0") {
    val week = Seq(10L, 20L, 30L, 40L, 30L, 20L, 10L)
    val r = run(mk("s", week ++ week ++ week))("s")
    assert(r.getLong(1) == 14L)
    assert(r.getDouble(3) == 0.0)             // mae_seasonal7
    assert(r.getDouble(4) == 0.0)             // mase
    assert(r.getDouble(2) > 0.0)              // naive1 pays the cycle
  }

  test("q185 linear trend: naive1 wins, MASE = 7") {
    // y_t = t: |y - l1| = 1, |y - l7| = 7 every scored day
    val r = run(mk("s", (1L to 20L)))("s")
    assert(r.getLong(1) == 13L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 7.0)
    assert(r.getDouble(4) == 7.0)
  }

  test("q185 constant series: both MAE 0, MASE NULL (0/0 guarded)") {
    val r = run(mk("s", Seq.fill(10)(5L)))("s")
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
    assert(r.isNullAt(4))
  }

  test("q185 short series (< 8 points) emits no row") {
    assert(run(mk("s", Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))).isEmpty)
  }

  test("q185 matches brute force on fixed random series per group") {
    val rnd = new scala.util.Random(185185L)
    val series = Seq("a", "b").flatMap(g => mk(g, Seq.fill(30)(rnd.nextInt(100).toLong)))
    val out = run(series)
    for (g <- Seq("a", "b")) {
      val vs = series.filter(_._1 == g).sortBy(_._2).map(_._3)
      val scored = (7 until vs.size)
      val e1 = scored.map(t => math.abs(vs(t) - vs(t - 1))).sum
      val e7 = scored.map(t => math.abs(vs(t) - vs(t - 7))).sum
      val r = out(g)
      assert(r.getLong(1) == scored.size.toLong)
      assert(r.getDouble(2) == e1.toDouble / scored.size)
      assert(r.getDouble(3) == e7.toDouble / scored.size)
      assert(r.getDouble(4) == (e7.toDouble / scored.size) / (e1.toDouble / scored.size))
    }
  }
}
