package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.{KsTest, MannWhitney}

/** q171 KS distance / q172 Mann–Whitney U: hand-computed statistics,
  * tie rules, degenerate-sample guards, and fixed-seed differentials
  * against brute-force references.
  */
class HypothesisSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def samples(a: Seq[Double], b: Seq[Double]) =
    spark.createDataFrame(
      (a.map(v => Row("a", v)) ++ b.map(v => Row("b", v))).asJava,
      StructType.fromDDL("grp STRING, v DOUBLE"))

  private def ks(a: Seq[Double], b: Seq[Double]) =
    KsTest.ksDistance(samples(a, b), col("grp") === "a", col("v")).collect()(0)

  private def mw(a: Seq[Double], b: Seq[Double]) =
    MannWhitney.uTest(samples(a, b), col("grp") === "a", col("v")).collect()(0)

  // ---- q171 KS ----

  test("q171 identical samples give D = 0") {
    val r = ks(Seq(1, 2, 3), Seq(1, 2, 3))
    assert(r.getAs[Long]("d_num") == 0L)
    assert(r.getAs[Double]("d_stat") == 0.0)
  }

  test("q171 fully separated samples give D = 1 at the lower sample's max") {
    val r = ks(Seq(1, 2, 3), Seq(4, 5, 6))
    assert(r.getAs[Long]("d_num") == 9L)
    assert(r.getAs[Double]("d_stat") == 1.0)
    assert(r.getAs[Double]("x_at_max") == 3.0)
  }

  test("q171 argmax tie breaks to the smallest value") {
    // interleaved {1,3} vs {2,4}: num = 2 at v=1 and v=3
    val r = ks(Seq(1, 3), Seq(2, 4))
    assert(r.getAs[Long]("d_num") == 2L)
    assert(r.getAs[Double]("x_at_max") == 1.0)
  }

  test("q171 matches brute force on fixed random samples") {
    val rnd = new scala.util.Random(171171L)
    for (trial <- 0 until 3) {
      val a = Seq.fill(30)((rnd.nextInt(12) + 1).toDouble)
      val b = Seq.fill(40)((rnd.nextInt(12) + 3).toDouble)
      val values = (a ++ b).distinct.sorted
      val nums = values.map(x =>
        math.abs(a.count(_ <= x).toLong * b.size - b.count(_ <= x).toLong * a.size))
      val r = ks(a, b)
      assert(r.getAs[Long]("d_num") == nums.max, s"trial $trial d_num")
      assert(r.getAs[Double]("x_at_max") ==
        values(nums.indexOf(nums.max)), s"trial $trial argmax")
    }
  }

  // ---- q172 Mann–Whitney ----

  test("q172 textbook separated ranks: U1 = 0 and the U identity") {
    val r = mw(Seq(1, 2), Seq(3, 4))
    assert(r.getAs[Long]("two_r1") == 6L) // ranks 1 + 2
    assert(r.getAs[Long]("u1_x2") == 0L)
    // U1 + U2 = n1*n2: 2*U2 = 2*n1*n2 - u1_x2
    assert(2L * 2L * 2L - r.getAs[Long]("u1_x2") == 8L)
  }

  test("q172 tie block gets the average rank without materializing halves") {
    // a={1,1}, b={1,2}: tie block of 3 at v=1, avg rank 2 -> R1 = 4
    val r = mw(Seq(1, 1), Seq(1, 2))
    assert(r.getAs[Long]("two_r1") == 8L)
    assert(r.getAs[Long]("u1_x2") == 2L) // U1 = 1: two b=1 half-ties
  }

  test("q172 all observations tied guards z to NULL") {
    val r = mw(Seq(5, 5), Seq(5, 5))
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("q172 matches brute-force pair counting on fixed random samples") {
    val rnd = new scala.util.Random(172172L)
    for (trial <- 0 until 3) {
      val a = Seq.fill(25)((rnd.nextInt(8) + 1).toDouble)
      val b = Seq.fill(35)((rnd.nextInt(8) + 1).toDouble)
      // 2*U1 = 2*#(a>b) + #(a==b) over all pairs
      val u1x2 = (for (x <- a; y <- b) yield {
        if (x > y) 2L else if (x == y) 1L else 0L
      }).sum
      val r = mw(a, b)
      assert(r.getAs[Long]("u1_x2") == u1x2, s"trial $trial u1_x2")
      // z recomputed from the same exact integers
      val n1 = a.size.toLong; val n2 = b.size.toLong; val n = n1 + n2
      val ties = (a ++ b).groupBy(identity).values
        .map(g => g.size.toLong).map(t => t * t * t - t).sum
      val sig2 = (n1.toDouble * n2.toDouble / 12.0) *
        ((n + 1).toDouble - ties.toDouble / (n.toDouble * (n - 1).toDouble))
      val z = BigDecimal((u1x2.toDouble - n1.toDouble * n2.toDouble) /
        (2.0 * math.sqrt(sig2)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-9, s"trial $trial z")
    }
  }
}
