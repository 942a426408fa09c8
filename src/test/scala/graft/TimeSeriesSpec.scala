package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{Acf, Twap}

/** Behavioral checks for q144 (time-weighted average) and q145
  * (autocorrelation): a hand-computed two-segment hold where TWAP and
  * plain average must disagree, the equal-spacing identity (TWAP ≡
  * plain average of the held values), the period-2 alternating series
  * (acf(1) = −1, acf(2) = +1), and a linear trend (acf ≈ 1 at every
  * lag).
  */
class TimeSeriesSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // ---- q144: TWAP ----

  test("q144 long hold dominates: hand-computed two-segment integral") {
    // value 10 held 9 s, then value 100 held 1 s, then terminal obs.
    // TWAP = (10*9 + 100*1) / 10 = 19.0; plain avg of held = 55.0
    val out = Twap.twap(df("k STRING, t TIMESTAMP, v DOUBLE")(Seq(
      Row("a", ts(0), 10.0), Row("a", ts(9), 100.0), Row("a", ts(10), 7.0))),
      "k", "t", "v").collect().head
    assert(out.getAs[Double]("twap") == 19.0)
    assert(out.getAs[Double]("plain_avg") == 55.0)
    assert(out.getAs[Long]("n_holds") == 2L)
    assert(out.getAs[Long]("span_micros") == 10000000L)
  }

  test("q144 equal spacing makes TWAP equal the plain average") {
    val vals = Seq(3.0, 7.0, 11.0, 23.0)
    val rows = vals.zipWithIndex.map { case (v, i) => Row("a", ts(i * 5L), v) } :+
      Row("a", ts(20L), 99.0) // terminal observation, excluded
    val out = Twap.twap(df("k STRING, t TIMESTAMP, v DOUBLE")(rows), "k", "t", "v")
      .collect().head
    assert(out.getAs[Double]("twap") == vals.sum / vals.length)
    assert(out.getAs[Double]("plain_avg") == vals.sum / vals.length)
  }

  test("q144 single-observation keys vanish (no holding interval)") {
    val out = Twap.twap(df("k STRING, t TIMESTAMP, v DOUBLE")(Seq(
      Row("solo", ts(0), 5.0),
      Row("pair", ts(0), 1.0), Row("pair", ts(1), 2.0))),
      "k", "t", "v")
    assert(out.collect().map(_.getAs[String]("k")).toSeq == Seq("pair"))
  }

  // ---- q145: ACF ----

  private def series(vals: Seq[Long]) =
    df("d LONG, n LONG")(vals.zipWithIndex.map { case (v, i) => Row(i + 1L, v) })

  test("q145 alternating series: acf(1) = -1, acf(2) = +1") {
    val out = Acf.acf(series(Seq.tabulate(20)(i => if (i % 2 == 0) 10L else 30L)),
      "d", "n", maxLag = 2).orderBy("k").collect()
    assert(out(0).getAs[Double]("acf") == -1.0)
    assert(out(1).getAs[Double]("acf") == 1.0)
    assert(out(0).getAs[Long]("n_pairs") == 19L)
    assert(out(1).getAs[Long]("n_pairs") == 18L)
  }

  test("q145 linear trend stays perfectly correlated at every lag") {
    val out = Acf.acf(series((1L to 30L)), "d", "n", maxLag = 7).collect()
    assert(out.length == 7)
    assert(out.forall(_.getAs[Double]("acf") == 1.0))
  }

  test("q145 planted period-7 cycle spikes at lag 7") {
    val rnd = new scala.util.Random(145)
    val vals = Seq.tabulate(70)(i =>
      (if (i % 7 == 0) 100L else 10L) + rnd.nextInt(3))
    val byK = Acf.acf(series(vals), "d", "n", maxLag = 7).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("acf")).toMap
    assert(byK(7L) > 0.9)
    assert((1L to 6L).forall(k => byK(k) < 0.5))
  }
}
