package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{ChiSquare, LagFeatures, NegativeSample}

/** Behavioral checks for q165 (chi-square contingency), q166
  * (lag-feature panel), and q167 (negative sampling): exact
  * independence giving chi2 = 0, the perfectly-associated 2x2 giving
  * Cramér's V = 1, leakage-safe feature frames on a crafted panel,
  * and positive-exclusion / exact-K / determinism of the sampler.
  */
class FeatureGenSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // ---- q165: chi-square ----

  test("q165 exact independence: chi2 = 0, V = 0") {
    // P(r, c) factorizes exactly: counts r1=(10,20), r2=(20,40)
    val rows = Seq.fill(10)(Row("r1", "c1")) ++ Seq.fill(20)(Row("r1", "c2")) ++
      Seq.fill(20)(Row("r2", "c1")) ++ Seq.fill(40)(Row("r2", "c2"))
    val out = ChiSquare.contingency(df("r STRING, c STRING")(rows), "r", "c")
      .collect().head
    assert(out.getAs[Double]("chi2") == 0.0)
    assert(out.getAs[Double]("cramers_v") == 0.0)
    assert(out.getAs[Long]("dof") == 1L)
  }

  test("q165 perfect association: V = 1") {
    val rows = Seq.fill(30)(Row("r1", "c1")) ++ Seq.fill(30)(Row("r2", "c2"))
    val out = ChiSquare.contingency(df("r STRING, c STRING")(rows), "r", "c")
      .collect().head
    assert(out.getAs[Double]("cramers_v") == 1.0)
    assert(out.getAs[Double]("chi2") == 60.0) // chi2 = n for a perfect 2x2
  }

  test("q165 expected counts come from the margins") {
    val rows = Seq.fill(5)(Row("r1", "c1")) ++ Seq.fill(15)(Row("r1", "c2")) ++
      Seq.fill(10)(Row("r2", "c1")) ++ Seq.fill(10)(Row("r2", "c2"))
    val out = ChiSquare.contingency(df("r STRING, c STRING")(rows), "r", "c")
      .collect().map(r2 => (r2.getAs[String]("r"), r2.getAs[String]("c")) ->
        r2.getAs[Double]("expected")).toMap
    assert(out(("r1", "c1")) == 20.0 * 15 / 40) // rt*ct/n = 7.5
  }

  // ---- q166: lag features ----

  test("q166 crafted panel: zero-fill, lags, rolling sum, label alignment") {
    def d(i: Int) = Date.valueOf(f"2024-01-${i}%02d")
    // active days 1 (n=5) and 3 (n=2); day 2 is a REAL zero row
    val out = LagFeatures.panel(
      df("u LONG, day DATE, n LONG")(Seq(Row(1L, d(1), 5L), Row(1L, d(3), 2L))),
      "u", "day", "n")
      .orderBy("day").collect()
    assert(out.length == 2) // day 3 has no label → dropped
    val day1 = out(0); val day2 = out(1)
    assert(day1.getAs[Long]("n_today") == 5L && day1.getAs[Long]("label_tomorrow") == 0L)
    assert(day2.getAs[Long]("n_today") == 0L)          // the zero-filled gap day
    assert(day2.getAs[Long]("n_yesterday") == 5L)
    assert(day2.getAs[Long]("label_tomorrow") == 2L)
    assert(day2.getAs[Long]("sum_7d") == 5L)
    assert(day2.getAs[Int]("days_since_active") == 1)
  }

  test("q166 nothing from the future leaks into predictors") {
    def d(i: Int) = Date.valueOf(f"2024-01-${i}%02d")
    // a huge burst on the LAST day must not appear in any earlier row's features
    val out = LagFeatures.panel(
      df("u LONG, day DATE, n LONG")(
        Seq(Row(1L, d(1), 1L), Row(1L, d(2), 1L), Row(1L, d(9), 1000L))),
      "u", "day", "n")
      .orderBy("day").collect()
    val preBurst = out.dropRight(1)
    assert(preBurst.forall(_.getAs[Long]("sum_7d") <= 2L))
    assert(preBurst.forall(_.getAs[Long]("n_yesterday") <= 1L))
    // only through the label can the burst be seen, on exactly one row
    assert(out.count(_.getAs[Long]("label_tomorrow") == 1000L) == 1)
  }

  // ---- q167: negative sampling ----

  private val items = (1 to 10).map(i => Row(f"item$i%02d"))

  test("q167 sampled negatives never include a positive, exactly K each") {
    val pos = df("s LONG, i STRING")(Seq(
      Row(1L, "item01"), Row(1L, "item02"), Row(2L, "item05")))
    val out = NegativeSample.negatives(pos, df("i STRING")(items), "s", "i", k = 3)
      .collect()
    val bySubj = out.groupBy(_.getAs[Long]("s"))
    assert(bySubj(1L).length == 3 && bySubj(2L).length == 3)
    assert(!bySubj(1L).exists(r => Set("item01", "item02")(r.getAs[String]("neg_item"))))
    assert(!bySubj(2L).exists(_.getAs[String]("neg_item") == "item05"))
  }

  test("q167 complement smaller than K returns the whole complement") {
    val pos = df("s LONG, i STRING")(
      (1 to 9).map(i => Row(1L, f"item$i%02d")))
    val out = NegativeSample.negatives(pos, df("i STRING")(items), "s", "i", k = 3)
      .collect()
    assert(out.length == 1 && out.head.getAs[String]("neg_item") == "item10")
  }

  test("q167 draws are identical across runs (hash-keyed, not rand)") {
    val pos = df("s LONG, i STRING")(Seq(Row(7L, "item03")))
    def draw() = NegativeSample.negatives(pos, df("i STRING")(items), "s", "i", k = 3)
      .orderBy("draw_rank").collect().map(_.getAs[String]("neg_item")).toSeq
    assert(draw() == draw())
  }
}
