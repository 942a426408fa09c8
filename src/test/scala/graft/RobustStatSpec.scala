package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions._

import graft.queries.{Mad, ModeStat}

/** Behavioral checks for q150 (mode with deterministic tiebreak) and
  * q151 (MAD robust outliers): the tie resolving to the smallest
  * value, margin arithmetic, the MAD ignoring a wild outlier that
  * would wreck stddev, the robust-z count, and exact/approx path
  * agreement on a well-separated fixture.
  */
class RobustStatSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // ---- q150: mode ----

  test("q150 plain majority wins with the right margin and share") {
    val out = ModeStat.mode(df("k STRING, v STRING")(Seq(
      Row("a", "x"), Row("a", "x"), Row("a", "x"), Row("a", "y"))), "k", "v")
      .collect().head
    assert(out.getAs[String]("mode_value") == "x")
    assert(out.getAs[Long]("n_mode") == 3L && out.getAs[Long]("n_total") == 4L)
    assert(out.getAs[Double]("share") == 0.75)
    assert(out.getAs[Long]("margin") == 2L)
  }

  test("q150 exact tie resolves to the lexicographically smallest value") {
    val out = ModeStat.mode(df("k STRING, v STRING")(Seq(
      Row("a", "zz"), Row("a", "zz"), Row("a", "aa"), Row("a", "aa"))), "k", "v")
      .collect().head
    assert(out.getAs[String]("mode_value") == "aa")
    assert(out.getAs[Long]("margin") == 0L) // tie → zero margin
  }

  test("q150 single-value group has no runner-up: margin = count") {
    val out = ModeStat.mode(df("k STRING, v STRING")(Seq(
      Row("a", "only"), Row("a", "only"))), "k", "v").collect().head
    assert(out.getAs[Long]("margin") == 2L)
  }

  // ---- q151: MAD ----

  test("q151 MAD shrugs off the wild outlier that inflates stddev") {
    // 9 values near 10 plus one at 1e6: med ~ 10, MAD stays ~1
    val vals = Seq(8.0, 9.0, 9.5, 10.0, 10.0, 10.5, 11.0, 11.5, 12.0, 1e6)
    val out = Mad.madOutliers(
      df("k STRING, v DOUBLE")(vals.map(Row("a", _))), "k", "v").collect().head
    assert(math.abs(out.getAs[Double]("med") - 10.0) < 0.5)
    assert(out.getAs[Double]("mad") < 2.0)
    assert(out.getAs[Long]("n_outliers") == 1L)
    assert(out.getAs[Double]("outlier_rate") == 0.1)
  }

  test("q151 clean constant data has MAD 0 and no outliers") {
    val out = Mad.madOutliers(
      df("k STRING, v DOUBLE")(Seq.fill(8)(Row("a", 5.0))), "k", "v").collect().head
    assert(out.getAs[Double]("mad") == 0.0)
    assert(out.getAs[Long]("n_outliers") == 0L)
  }

  test("q151 exact and approx paths agree on a well-separated fixture") {
    val rnd = new scala.util.Random(151)
    // bounded noise: max |dev| = 0.5 < 4.4478 * MAD(~0.25), so the ONLY
    // robust-z exceedances are the 5 planted spikes (a gaussian would
    // legitimately put its own tail past 3 sigma)
    val rows = Seq.tabulate(500)(i =>
      Row("a", 50.0 + rnd.nextDouble() - 0.5)) ++ Seq.fill(5)(Row("a", 500.0))
    val in = df("k STRING, v DOUBLE")(rows)
    val ex = Mad.madOutliers(in, "k", "v", exact = true).collect().head
    val ap = Mad.madOutliers(in, "k", "v", exact = false).collect().head
    assert(ex.getAs[Long]("n_outliers") == 5L)
    assert(ap.getAs[Long]("n_outliers") == 5L)
    assert(math.abs(ex.getAs[Double]("med") - ap.getAs[Double]("med")) < 0.5)
    assert(math.abs(ex.getAs[Double]("mad") - ap.getAs[Double]("mad")) < 0.5)
  }

  test("q151 approx path never materializes a per-group array") {
    val in = df("k STRING, v DOUBLE")(Seq.tabulate(50)(i => Row("a", i.toDouble)))
    val plan = Mad.madOutliers(in, "k", "v", exact = false)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list"))
  }
}
