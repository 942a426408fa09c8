package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions._

import graft.queries.{Basket, Melt}

/** Behavioral checks for q140 (unpivot/melt) and q141 (market-basket
  * lift): the exact (measure → value) fiber of a known wide row, melt
  * row-count arithmetic, and a hand-built 4-basket design with a
  * perfectly co-occurring pair (lift > 1), an independent pair
  * (lift = 1), and a never-together pair (absent).
  */
class ReshapeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // ---- q140: melt ----

  private def li(flag: String, status: String, qty: Double, price: Double,
      disc: Double) = Row(flag, status, qty, price, disc)

  private val liSchema =
    "l_returnflag STRING, l_linestatus STRING, l_quantity DOUBLE, " +
      "l_extendedprice DOUBLE, l_discount DOUBLE"

  test("q140 melts one wide row into its exact measure fiber") {
    val out = Melt.melt(df(liSchema)(Seq(
      li("A", "F", 2.0, 100.0, 0.1),
      li("A", "F", 3.0, 200.0, 0.2)))).collect()
    assert(out.length == 4) // 1 group x 4 measures
    val byMeasure = out.map(r =>
      r.getAs[String]("measure") -> r.getAs[Double]("value")).toMap
    assert(byMeasure == Map(
      "sum_qty" -> 5.0, "sum_price" -> 300.0, "sum_disc" -> 0.3, "n_rows" -> 2.0))
  }

  test("q140 output rows = groups x measures, keys preserved") {
    val out = Melt.melt(df(liSchema)(Seq(
      li("A", "F", 1.0, 1.0, 0.0), li("R", "O", 1.0, 1.0, 0.0))))
    assert(out.count() == 8)
    assert(out.select("l_returnflag", "l_linestatus").distinct().count() == 2)
    assert(out.columns.toSeq ==
      Seq("l_returnflag", "l_linestatus", "measure", "value"))
  }

  // ---- q141: basket lift ----

  private val basketSchema = "bid LONG, item STRING"

  test("q141 hand-built design: perfect co-occurrence, independence, never-together") {
    // 4 baskets: x and y ALWAYS together (and only ever together),
    // u in all 4 baskets (independent of everything), z alone with u.
    //   b1: x y u | b2: x y u | b3: z u | b4: z u
    val rows = Seq(
      Row(1L, "x"), Row(1L, "y"), Row(1L, "u"),
      Row(2L, "x"), Row(2L, "y"), Row(2L, "u"),
      Row(3L, "z"), Row(3L, "u"),
      Row(4L, "z"), Row(4L, "u"))
    val out = Basket.lift(df(basketSchema)(rows), "bid", "item", minSupport = 1)
      .collect()
      .map(r => (r.getAs[String]("brand_a"), r.getAs[String]("brand_b")) -> r)
      .toMap
    // (x, y): c_ab=2, c_x=2, c_y=2, n=4 → lift = 4*2/(2*2) = 2
    val xy = out(("x", "y"))
    assert(xy.getAs[Long]("c_ab") == 2L && xy.getAs[Double]("lift") == 2.0)
    assert(xy.getAs[Double]("conf_ab") == 1.0)
    // (u, x): c_ab=2, c_u=4, c_x=2, n=4 → lift = 4*2/(4*2) = 1 (independent)
    val ux = out(("u", "x"))
    assert(ux.getAs[Double]("lift") == 1.0)
    // (x, z) never co-occur → absent from the pair frame entirely
    assert(!out.contains(("x", "z")) && !out.contains(("z", "x")))
    // every pair is emitted exactly once, in sorted (a < b) order
    assert(out.keys.forall { case (a, b) => a < b })
  }

  test("q141 min-support gate drops rare pairs") {
    val rows = Seq(
      Row(1L, "x"), Row(1L, "y"),
      Row(2L, "x"), Row(2L, "y"),
      Row(3L, "x"), Row(3L, "q")) // (x,q) support 1
    val out = Basket.lift(df(basketSchema)(rows), "bid", "item", minSupport = 2)
    val pairs = out.select("brand_a", "brand_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("x", "y")))
  }

  test("q141 duplicate lines in one basket count once (set semantics)") {
    val rows = Seq(
      Row(1L, "x"), Row(1L, "x"), Row(1L, "y"),
      Row(2L, "x"), Row(2L, "y"))
    val out = Basket.lift(df(basketSchema)(rows), "bid", "item", minSupport = 1)
      .filter(col("brand_a") === "x" && col("brand_b") === "y").collect().head
    assert(out.getAs[Long]("c_ab") == 2L && out.getAs[Long]("c_a") == 2L)
  }
}
