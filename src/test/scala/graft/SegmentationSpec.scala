package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{Entropy, Rfm, TheilSen}

/** Behavioral checks for q153 (Theil-Sen robust trend), q154
  * (Shannon entropy diversity), and q155 (RFM quartiles): the
  * outlier-immunity contrast (one spike drags OLS, not the median
  * slope), the uniform-distribution entropy maximum H = ln k and
  * evenness 1, the single-type zero, and quartile arithmetic with
  * deterministic tiebreaks.
  */
class SegmentationSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // ---- q153: Theil-Sen ----

  test("q153 exact line recovers its slope in both estimators") {
    val rows = (0L to 9L).map(x => Row(x, 3 * x + 7))
    val out = TheilSen.slopes(df("x LONG, y LONG")(rows), "x", "y").collect().head
    assert(out.getAs[Double]("ts_slope") == 3.0)
    assert(out.getAs[Double]("ols_slope") == 3.0)
    assert(out.getAs[Long]("n_pairs") == 45L)
  }

  test("q153 one wild outlier drags OLS but not Theil-Sen") {
    val rows = (0L to 9L).map(x => Row(x, if (x == 9L) 1000L else 2 * x))
    val out = TheilSen.slopes(df("x LONG, y LONG")(rows), "x", "y").collect().head
    assert(out.getAs[Double]("ts_slope") == 2.0)   // median slope untouched
    assert(out.getAs[Double]("ols_slope") > 10.0)  // OLS wrecked
  }

  // ---- q154: entropy ----

  test("q154 uniform distribution hits H = ln k with evenness 1") {
    val rows = for (t <- Seq("a", "b", "c", "d"); _ <- 1 to 5) yield Row("u", t)
    val out = Entropy.diversity(df("k STRING, t STRING")(rows), "k", "t")
      .collect().head
    assert(math.abs(out.getAs[Double]("entropy") - math.log(4.0)) < 1e-5)
    assert(math.abs(out.getAs[Double]("evenness") - 1.0) < 1e-5)
    assert(out.getAs[Long]("n_types") == 4L)
  }

  test("q154 single-type user: H = 0 exactly, evenness NULL") {
    val out = Entropy.diversity(
      df("k STRING, t STRING")(Seq.fill(7)(Row("u", "only"))), "k", "t")
      .collect().head
    assert(out.getAs[Double]("entropy") == 0.0)
    assert(out.isNullAt(out.fieldIndex("evenness")))
  }

  test("q154 skew strictly lowers entropy below the uniform") {
    val uniform = Seq.fill(10)(Row("u", "a")) ++ Seq.fill(10)(Row("u", "b"))
    val skewed  = Seq.fill(19)(Row("s", "a")) ++ Seq.fill(1)(Row("s", "b"))
    val out = Entropy.diversity(
      df("k STRING, t STRING")(uniform ++ skewed), "k", "t")
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("entropy")).toMap
    assert(out("u") > out("s") && out("s") > 0.0)
  }

  // ---- q155: RFM ----

  test("q155 quartiles split 8 customers 2-2-2-2 with deterministic cells") {
    // recency 1..8, frequency/monetary aligned so quartiles coincide
    val rows = (1 to 8).map { i =>
      Row(i.toLong, i.toLong, i.toLong * 10, i.toDouble * 100) // id, rec, freq, mon
    }
    val out = Rfm.cells(
      df("o_custkey LONG, recency LONG, frequency LONG, monetary DOUBLE")(rows),
      "o_custkey").collect()
    assert(out.map(_.getAs[Long]("n_customers")).sum == 8L)
    // most-recent (recency 1,2) scores r=4; least-recent scores r=1
    val byCell = out.map(r => (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"),
      r.getAs[Int]("m_score")) -> r).toMap
    assert(byCell.contains((4, 1, 1))) // recency 1,2 = most recent, lowest freq/mon
    assert(byCell((4, 1, 1)).getAs[Long]("n_customers") == 2L)
    assert(byCell((4, 1, 1)).getAs[Double]("avg_recency") == 1.5)
    assert(byCell.contains((1, 4, 4)))
    assert(byCell((1, 4, 4)).getAs[Double]("avg_monetary") == 750.0)
  }

  test("q155 all-tied metrics still split deterministically by custkey") {
    val rows = (1 to 4).map(i => Row(i.toLong, 5L, 3L, 42.0))
    val out = Rfm.cells(
      df("o_custkey LONG, recency LONG, frequency LONG, monetary DOUBLE")(rows),
      "o_custkey").collect()
    // ntile assigns one per bucket; custkey tiebreak makes it reproducible
    assert(out.map(_.getAs[Long]("n_customers")).sum == 4L)
    assert(out.length == 4)
  }
}
