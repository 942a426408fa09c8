package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.det
import graft.queries.Waterfall

/** q219 price/volume/mix bridge: every component isolated on a
  * hand-built fixture, and the exact-by-construction reconciliation.
  */
class WaterfallSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def run(rows: Seq[(Long, Double, Double, Double, Double)]) = {
    val df = spark.createDataFrame(
      rows.map { case (i, q0, r0, q1, r1) => Row(i, q0, r0, q1, r1) }.asJava,
      StructType.fromDDL(
        "item BIGINT, q0d DOUBLE, rev0d DOUBLE, q1d DOUBLE, rev1d DOUBLE"))
      .select(col("item"),
        col("q0d").cast(det.D20_6).as("q0"),
        col("rev0d").cast(det.D20_6).as("rev0"),
        col("q1d").cast(det.D20_6).as("q1"),
        col("rev1d").cast(det.D20_6).as("rev1"))
    val r = Waterfall.bridge(df).collect()(0)
    (r.getAs[Double]("revenue_p0"), r.getAs[Double]("revenue_p1"),
      r.getAs[Double]("volume_effect"), r.getAs[Double]("price_effect"),
      r.getAs[Double]("cross_effect"), r.getAs[Double]("new_items"),
      r.getAs[Double]("discontinued_items"), r.getAs[Boolean]("reconciles"))
  }

  test("q219 each component isolated on the five-item fixture") {
    val rows = Seq(
      (1L, 10.0, 100.0, 20.0, 200.0), // pure volume: +100 at p=10
      (2L, 10.0, 100.0, 10.0, 150.0), // pure price: +50 at q=10
      (3L, 10.0, 100.0, 20.0, 400.0), // mixed: vol 100, price 100, cross 100
      (4L, 0.0, 0.0, 5.0, 55.0),      // new item: +55
      (5L, 4.0, 44.0, 0.0, 0.0))      // discontinued: -44
    val (r0, r1, vol, price, cross, nw, disc, ok) = run(rows)
    assert(r0 == 344.0 && r1 == 805.0)
    assert(vol == 200.0)
    assert(price == 150.0)
    assert(cross == 100.0)
    assert(nw == 55.0 && disc == -44.0)
    assert(ok)
    assert(vol + price + cross + nw + disc == r1 - r0)
  }

  test("q219 identical periods bridge to all-zero effects") {
    val rows = Seq((1L, 7.0, 91.0, 7.0, 91.0), (2L, 3.0, 33.0, 3.0, 33.0))
    val (r0, r1, vol, price, cross, nw, disc, ok) = run(rows)
    assert(r0 == r1)
    assert(vol == 0.0 && price == 0.0 && cross == 0.0)
    assert(nw == 0.0 && disc == 0.0 && ok)
  }

  test("q219 reconciles even when per-item terms quantize (ugly prices)") {
    // p0 = 100/7 is not 6-decimal-exact: vol/price quantize, cross
    // absorbs the residue, the identity still holds to the cent
    val rows = Seq((1L, 7.0, 100.0, 11.0, 260.0), (2L, 13.0, 99.0, 9.0, 77.0))
    val (r0, r1, vol, price, cross, _, _, ok) = run(rows)
    assert(ok)
    assert(math.abs((vol + price + cross) - (r1 - r0)) < 1e-9)
  }
}
