package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{Gini, Retention, WeightedMedian}

/** Behavioral checks for q156 (weighted median), q157 (Gini
  * concentration), and q158 (retention triangle): the textbook
  * weighted-median worked example and the heavy-single-value pull,
  * perfect equality G = 0 vs the one-whale extreme, top-decile
  * arithmetic, and a hand-built two-cohort triangle with known decay.
  */
class ConcentrationSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // ---- q156: weighted median ----

  private def wm(rows: Seq[(Double, Long)]): Row =
    WeightedMedian.weightedMedian(
      df("k STRING, v DOUBLE, w LONG")(rows.map { case (v, w) => Row("a", v, w) }),
      "k", "v", "w").collect().head

  test("q156 weight mass, not row count, picks the median") {
    // values 1,2,3 with weights 1,1,10: half the mass (6) sits at v=3
    val out = wm(Seq((1.0, 1L), (2.0, 1L), (3.0, 10L)))
    assert(out.getAs[Double]("w_median") == 3.0)
    assert(out.getAs[Long]("total_weight") == 12L)
    // the unweighted median would be 2
  }

  test("q156 textbook lower weighted median at the exact half point") {
    // weights 1,1,2 over 10,20,30: cum at 20 is 2 = W/2 → lower median 20
    val out = wm(Seq((10.0, 1L), (20.0, 1L), (30.0, 2L)))
    assert(out.getAs[Double]("w_median") == 20.0)
    assert(out.getAs[Long]("cum_weight_at_median") == 2L)
  }

  test("q156 duplicate values merge their weights") {
    val out = wm(Seq((5.0, 3L), (5.0, 3L), (9.0, 1L)))
    assert(out.getAs[Double]("w_median") == 5.0)
    assert(out.getAs[Long]("total_weight") == 7L)
  }

  // ---- q157: Gini ----

  private def giniOf(spends: Seq[Double]): Row =
    Gini.gini(
      df("id LONG, spend DOUBLE")(
        spends.zipWithIndex.map { case (s, i) => Row(i + 1L, s) }),
      "id", "spend").collect().head

  test("q157 perfect equality scores 0") {
    assert(giniOf(Seq.fill(10)(100.0)).getAs[Double]("gini") == 0.0)
  }

  test("q157 one whale owning everything approaches (n-1)/n") {
    val out = giniOf(Seq.fill(9)(0.0) :+ 1000.0)
    assert(out.getAs[Double]("gini") == 0.9) // exactly (n-1)/n for one-owner
    assert(out.getAs[Double]("top_decile_share") == 1.0)
  }

  test("q157 top-decile share counts exactly ceil(n/10) top ranks") {
    // n=10 → exactly 1 member (the max); 20% of total mass here
    val out = giniOf((1 to 10).map(_ * 1.0))
    assert(out.getAs[Double]("top_decile_share") ==
      math.rint(10.0 / 55.0 * 10000) / 10000)
  }

  // ---- q158: retention triangle ----

  test("q158 hand-built two-cohort triangle with known decay") {
    def day(epochWeek: Int, dow: Int) =
      Date.valueOf(java.time.LocalDate.ofEpochDay(epochWeek * 7L + dow))
    // cohort A (week 100): u1, u2, u3 — u1 and u2 return week 101, u1 week 102
    // cohort B (week 101): u4 — never returns
    val rows = Seq(
      Row(1L, day(100, 0)), Row(2L, day(100, 2)), Row(3L, day(100, 6)),
      Row(1L, day(101, 3)), Row(2L, day(101, 5)),
      Row(1L, day(102, 1)),
      Row(4L, day(101, 0)))
    val out = Retention.triangle(df("u LONG, day DATE")(rows), "u", "day")
      .collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("offset_w")) -> r)
      .toMap
    assert(out((100L, 0L)).getAs[Long]("n_active") == 3L)
    assert(out((100L, 0L)).getAs[Double]("retention") == 1.0)
    assert(out((100L, 1L)).getAs[Long]("n_active") == 2L)
    assert(out((100L, 1L)).getAs[Double]("retention") == 2.0 / 3.0)
    assert(out((100L, 2L)).getAs[Long]("n_active") == 1L)
    assert(out((101L, 0L)).getAs[Long]("cohort_size") == 1L)
    assert(!out.contains((101L, 1L))) // u4 never returns
  }

  test("q158 twice-in-one-week counts once (offset-0 is always 100%)") {
    def d(s: String) = Date.valueOf(s)
    val rows = Seq(Row(1L, d("2024-01-01")), Row(1L, d("2024-01-02")))
    val out = Retention.triangle(df("u LONG, day DATE")(rows), "u", "day").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("retention") == 1.0)
  }
}
