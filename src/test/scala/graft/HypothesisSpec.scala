package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.{CrossCorr, KsTest, MannWhitney}

/** q171 KS distance / q172 Mann–Whitney U / q178 cross-correlation:
  * hand-computed statistics, tie rules, degenerate-sample guards, and
  * fixed-seed differentials against brute-force references.
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

  // ---- q178 cross-correlation ----

  private def ccf(xs: Seq[Long], ys: Seq[Long]) = {
    val rows = xs.zip(ys).zipWithIndex.map { case ((x, y), i) =>
      Row(i.toLong, x, y)
    }
    CrossCorr.ccf(
      spark.createDataFrame(rows.asJava, StructType.fromDDL("d LONG, x LONG, y LONG")),
      "d")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
  }

  test("q178 shifted copy peaks exactly at the shift") {
    // y is x led by 2 days: corr(x_t, y_{t+?}) peaks at k = -2
    // (y at t-2 equals x at t... construct y_t = x_{t+2})
    val x = Seq(5L, 9L, 2L, 7L, 4L, 8L, 1L, 6L, 3L, 9L, 5L, 2L)
    val y = x.drop(2) ++ Seq(0L, 0L)
    val out = ccf(x, y)
    // k = -2 pairs x_t with y_{t-2} = x_t -> perfect correlation
    assert(out(-2L)._2 == 1.0)
    assert(out(-2L)._1 == x.size - 2) // overlap loses |k| pairs
    assert(out(0L)._2 < 1.0)
  }

  test("q178 self series is symmetric with ccf(0) = 1") {
    val x = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L)
    val out = ccf(x, x)
    assert(out(0L) == ((x.size.toLong, 1.0)))
    // ccf(k) on x vs itself equals ccf(-k): same pair set re-centered
    for (k <- 1L to 3L) assert(out(k)._2 == out(-k)._2, s"k=$k")
  }

  test("q178 matches a brute-force Pearson per lag on fixed random series") {
    val rnd = new scala.util.Random(178178L)
    val x = Seq.fill(40)(rnd.nextInt(50).toLong)
    val y = Seq.fill(40)(rnd.nextInt(50).toLong)
    val out = ccf(x, y)
    for (k <- -3 to 3) {
      // pair x_t with y_{t+k} where both exist
      val pairs = x.indices.flatMap { t =>
        val u = t + k
        if (u >= 0 && u < y.size) Some((x(t), y(u))) else None
      }
      val n = pairs.size.toDouble
      val sx = pairs.map(_._1).sum.toDouble; val sy = pairs.map(_._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val ref = BigDecimal((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(k.toLong)._1 == pairs.size.toLong, s"k=$k n_pairs")
      assert(math.abs(out(k.toLong)._2 - ref) < 1e-9, s"k=$k ccf")
    }
  }
}
