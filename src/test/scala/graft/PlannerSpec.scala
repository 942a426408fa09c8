package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{Apportion, IdGaps, Skyline}

/** Behavioral checks for q159 (2-D skyline), q160 (largest-remainder
  * apportionment), and q161 (ID-gap audit): a hand-drawn Pareto
  * frontier with interior/tied/co-located points, exact-quota and
  * remainder-ordering arithmetic with the sum-equals-budget
  * invariant, and crafted hole patterns.
  */
class PlannerSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // ---- q159: skyline ----

  test("q159 hand-drawn frontier: interior points dominated, trade-offs kept") {
    // (price, size): frontier = (1,5), (3,8), (7,9); (4,4) dominated by
    // (3,8); (3,6) dominated by (3,8) same-price; (9,9) dominated by (7,9)
    val rows = Seq((1.0, 5), (3.0, 8), (7.0, 9), (4.0, 4), (3.0, 6), (9.0, 9))
      .map { case (p, s) => Row(p, s) }
    val out = Skyline.skyline2d(df("price DOUBLE, size INT")(rows), "price", "size")
      .collect().map(r => (r.getAs[Double]("price"), r.getAs[Int]("size"))).toSet
    assert(out == Set((1.0, 5), (3.0, 8), (7.0, 9)))
  }

  test("q159 duplicate optimum cells merge with member count") {
    val rows = Seq((1.0, 5), (1.0, 5), (2.0, 7)).map { case (p, s) => Row(p, s) }
    val out = Skyline.skyline2d(df("price DOUBLE, size INT")(rows), "price", "size")
      .collect().map(r => (r.getAs[Double]("price"), r.getAs[Int]("size")) ->
        r.getAs[Long]("n_members")).toMap
    assert(out == Map((1.0, 5) -> 2L, (2.0, 7) -> 1L))
  }

  test("q159 sub-unit price steps still dominate (the RANGE-frame trap)") {
    // (1.0, 5) vs (1.5, 5): the pricier same-size point is dominated
    // even though the price step is < 1
    val rows = Seq((1.0, 5), (1.5, 5)).map { case (p, s) => Row(p, s) }
    val out = Skyline.skyline2d(df("price DOUBLE, size INT")(rows), "price", "size")
      .collect()
    assert(out.length == 1 && out.head.getAs[Double]("price") == 1.0)
  }

  // ---- q160: apportionment ----

  private def alloc(counts: Seq[(String, Long)], budget: Long) =
    Apportion.hamilton(
      df("k STRING, n LONG")(counts.map { case (k, n) => Row(k, n) }),
      "k", "n", budget)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("alloc")).toMap

  test("q160 exact proportions need no remainder slots") {
    assert(alloc(Seq(("a", 20L), ("b", 30L), ("c", 50L)), 10L) ==
      Map("a" -> 2L, "b" -> 3L, "c" -> 5L))
  }

  test("q160 leftover slots go to the largest remainders") {
    // quotas for budget 10 over (3, 3, 4, 10): 1.5, 1.5, 2.0, 5.0
    // floors 1,1,2,5 = 9 → one leftover slot → largest remainder .5 tie
    // between a and b → name tiebreak gives it to a
    assert(alloc(Seq(("a", 3L), ("b", 3L), ("c", 4L), ("d", 10L)), 10L) ==
      Map("a" -> 2L, "b" -> 1L, "c" -> 2L, "d" -> 5L))
  }

  test("q160 allocation always sums exactly to the budget") {
    for (budget <- Seq(7L, 100L, 9999L)) {
      val out = alloc(Seq(("a", 17L), ("b", 5L), ("c", 311L), ("d", 2L)), budget)
      assert(out.values.sum == budget, s"budget $budget: $out")
    }
  }

  // ---- q161: ID gaps ----

  test("q161 crafted holes come out as exact ranges") {
    // present: 1,2,3, 7, 10,11 → gaps [4,6] (3 missing) and [8,9] (2)
    val out = IdGaps.gaps(
      df("id LONG")(Seq(1L, 2L, 3L, 7L, 10L, 11L).map(Row(_))), "id")
      .orderBy("gap_start").collect()
      .map(r => (r.getAs[Long]("gap_start"), r.getAs[Long]("gap_end"),
        r.getAs[Long]("missing")))
    assert(out.toSeq == Seq((4L, 6L, 3L), (8L, 9L, 2L)))
  }

  test("q161 dense sequence reports no gaps; duplicates don't fake them") {
    val out = IdGaps.gaps(
      df("id LONG")(Seq(5L, 5L, 6L, 7L, 7L, 8L).map(Row(_))), "id")
    assert(out.count() == 0L)
  }
}
