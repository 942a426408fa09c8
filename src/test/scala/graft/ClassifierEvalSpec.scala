package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.{Auc, Calibration, Welch}

/** q190 ROC-AUC / q191 calibration / q192 Welch t-test: hand-computed
  * statistics, textbook extremes, degenerate-sample guards, and
  * fixed-seed differentials against independent scalar references.
  */
class ClassifierEvalSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // ---- q190 AUC ----

  private def scored(rows: Seq[(Boolean, Long)]) =
    spark.createDataFrame(
      rows.map { case (p, s) => Row("g", p, s) }.asJava,
      StructType.fromDDL("k STRING, pos BOOLEAN, s BIGINT"))

  private def auc(rows: Seq[(Boolean, Long)]): Row =
    Auc.aucByKey(scored(rows), col("k"), col("pos"), col("s")).collect()(0)

  test("q190 perfect separation gives AUC = 1, inversion gives 0") {
    val r = auc(Seq((true, 10L), (true, 9L), (false, 2L), (false, 1L)))
    assert(r.getAs[Double]("auc") == 1.0)
    val r2 = auc(Seq((true, 1L), (true, 2L), (false, 9L), (false, 10L)))
    assert(r2.getAs[Double]("auc") == 0.0)
  }

  test("q190 all-tied scores give AUC = 0.5 (half credit per tie)") {
    val r = auc(Seq((true, 5L), (true, 5L), (false, 5L), (false, 5L)))
    assert(r.getAs[Double]("auc") == 0.5)
  }

  test("q190 hand-computed mixed ties: 3.5 of 4 pairs") {
    // pos {3, 2} vs neg {1, 2}: wins (3>1)(3>2)(2>1) + one tie/2
    val r = auc(Seq((true, 3L), (true, 2L), (false, 1L), (false, 2L)))
    assert(r.getAs[Double]("auc") == 0.875)
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
  }

  test("q190 one-class input guards AUC to NULL") {
    val r = auc(Seq((true, 3L), (true, 1L)))
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("q190 matches brute-force pair counting on fixed random samples") {
    val rnd = new scala.util.Random(190190L)
    for (trial <- 0 until 3) {
      val rows = Seq.fill(80)((rnd.nextBoolean(), rnd.nextInt(12).toLong))
      val pos = rows.filter(_._1).map(_._2)
      val neg = rows.filterNot(_._1).map(_._2)
      val wins = (for (p <- pos; n <- neg) yield
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      val expected = wins / (pos.size.toDouble * neg.size.toDouble)
      val r = auc(rows)
      assert(math.abs(r.getAs[Double]("auc") - expected) < 1e-12, s"trial $trial")
    }
  }

  test("q190 keys fold independently") {
    val df = spark.createDataFrame(
      Seq(Row("a", true, 2L), Row("a", false, 1L),
        Row("b", true, 1L), Row("b", false, 2L)).asJava,
      StructType.fromDDL("k STRING, pos BOOLEAN, s BIGINT"))
    val out = Auc.aucByKey(df, col("k"), col("pos"), col("s"))
      .orderBy(col("key")).collect()
    assert(out(0).getAs[Double]("auc") == 1.0)
    assert(out(1).getAs[Double]("auc") == 0.0)
  }

  // ---- q191 calibration ----

  private def bins(rows: Seq[(Double, Boolean)]) =
    Calibration.reliabilityBins(
      spark.createDataFrame(rows.map { case (p, y) => Row(p, y) }.asJava,
        StructType.fromDDL("p DOUBLE, y BOOLEAN")),
      col("p"), col("y")).orderBy(col("bin")).collect()

  test("q191 hand-computed two-bin reliability + Brier") {
    val out = bins(Seq((0.05, false), (0.05, true), (0.95, true), (0.95, true)))
    assert(out.length == 2)
    val b0 = out(0)
    assert(b0.getAs[Int]("bin") == 0 && b0.getAs[Long]("n") == 2L)
    assert(b0.getAs[Double]("frac_pos") == 0.5)
    assert(math.abs(b0.getAs[Double]("mean_p") - 0.05) < 1e-9)
    assert(math.abs(b0.getAs[Double]("gap") - 0.45) < 1e-9)
    assert(math.abs(b0.getAs[Double]("brier") - 0.4525) < 1e-9)
    val b9 = out(1)
    assert(b9.getAs[Int]("bin") == 9)
    assert(math.abs(b9.getAs[Double]("brier") - 0.0025) < 1e-9)
  }

  test("q191 p = 1.0 clamps into the top bin") {
    val out = bins(Seq((1.0, true)))
    assert(out.length == 1 && out(0).getAs[Int]("bin") == 9)
  }

  test("q191 perfectly calibrated bin has zero gap") {
    // bin 2 (p = 0.25): 1 of 4 positive
    val out = bins(Seq((0.25, true), (0.25, false), (0.25, false), (0.25, false)))
    assert(math.abs(out(0).getAs[Double]("gap")) < 1e-9)
  }

  // ---- q192 Welch ----

  private def welch(a: Seq[Double], b: Seq[Double]): Row =
    Welch.welchByKey(
      spark.createDataFrame(
        (a.map(v => Row("k", true, v)) ++ b.map(v => Row("k", false, v))).asJava,
        StructType.fromDDL("g STRING, a BOOLEAN, v DOUBLE")),
      col("g"), col("a"), col("v")).collect()(0)

  /** Independent scalar Welch reference. */
  private def refWelch(a: Seq[Double], b: Seq[Double]): (Double, Double) = {
    def mv(x: Seq[Double]) = {
      val n = x.size.toDouble
      val m = x.sum / n
      (n, m, x.map(v => (v - m) * (v - m)).sum / (n - 1))
    }
    val (n1, m1, v1) = mv(a); val (n2, m2, v2) = mv(b)
    val se2 = v1 / n1 + v2 / n2
    val t = (m1 - m2) / math.sqrt(se2)
    val df = se2 * se2 /
      ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1))
    (t, df)
  }

  test("q192 hand-computed unequal-variance case") {
    val r = welch(Seq(1, 2, 3, 4), Seq(2, 4, 6, 8, 10))
    val (t, df) = refWelch(Seq(1, 2, 3, 4), Seq(2, 4, 6, 8, 10))
    assert(math.abs(r.getAs[Double]("t") - t) < 1e-3)
    assert(math.abs(r.getAs[Double]("df") - df) < 1e-3)
    assert(math.abs(r.getAs[Double]("t") - (-2.2514)) < 1e-4)
  }

  test("q192 symmetry: swapping sides flips the sign of t") {
    val r1 = welch(Seq(1, 2, 3), Seq(7, 8, 9, 10))
    val r2 = welch(Seq(7, 8, 9, 10), Seq(1, 2, 3))
    assert(math.abs(r1.getAs[Double]("t") + r2.getAs[Double]("t")) < 1e-9)
    assert(math.abs(r1.getAs[Double]("df") - r2.getAs[Double]("df")) < 1e-9)
  }

  test("q192 zero-variance and tiny-sample guards give NULL t") {
    val r = welch(Seq(5, 5, 5), Seq(5, 5))
    assert(r.isNullAt(r.fieldIndex("t")))
    val r2 = welch(Seq(1), Seq(2, 3, 4))
    assert(r2.isNullAt(r2.fieldIndex("t")))
  }

  test("q192 matches the scalar reference on fixed random samples") {
    val rnd = new scala.util.Random(192192L)
    for (trial <- 0 until 3) {
      val a = Seq.fill(25)(rnd.nextInt(1000) / 10.0)
      val b = Seq.fill(35)(rnd.nextInt(1200) / 10.0 + 5.0)
      val (t, df) = refWelch(a, b)
      val r = welch(a, b)
      assert(math.abs(r.getAs[Double]("t") - t) < 1e-3, s"trial $trial t")
      assert(math.abs(r.getAs[Double]("df") - df) < 1e-3, s"trial $trial df")
    }
  }
}
