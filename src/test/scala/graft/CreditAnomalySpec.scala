package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.{Attribution, DatasetCard, RollingAnomaly}

/** q200 rolling robust anomaly / q201 positional attribution /
  * q202 dataset-card lower median: hand-computed Hampel scores,
  * degenerate-journey splits, credit-conservation, and cell-method
  * median fixtures.
  */
class CreditAnomalySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // ---- q200 rolling anomaly ----

  private def series(vs: Seq[Double]) =
    spark.createDataFrame(
      vs.zipWithIndex.map { case (v, i) =>
        Row(java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"), v)
      }.asJava,
      StructType.fromDDL("day TIMESTAMP, v DOUBLE"))

  test("q200 hand-computed spike: med 12, MAD 1, |z| > 3 flags") {
    val out = RollingAnomaly.robustZ(
      series(Seq(10, 12, 11, 13, 10, 14, 12, 100))).orderBy(col("day"))
      .collect()
    val spike = out(7)
    assert(spike.getAs[Double]("med") == 12.0)
    assert(spike.getAs[Double]("mad") == 1.0)
    assert(math.abs(spike.getAs[Double]("z") - 88.0 / 1.4826) < 1e-9)
    assert(spike.getAs[Boolean]("is_anomaly"))
    // warmup rows carry no score
    out.take(7).foreach(r => assert(r.isNullAt(r.fieldIndex("z"))))
  }

  test("q200 flat trailing week guards z to NULL (MAD = 0)") {
    val out = RollingAnomaly.robustZ(
      series(Seq.fill(7)(5.0) :+ 50.0)).orderBy(col("day")).collect()
    val last = out(7)
    assert(last.getAs[Double]("mad") == 0.0)
    assert(last.isNullAt(last.fieldIndex("z")))
    assert(last.isNullAt(last.fieldIndex("is_anomaly")))
  }

  test("q200 scoring is causal: the spike inflates later windows, not its own") {
    val out = RollingAnomaly.robustZ(
      series(Seq(10, 12, 11, 13, 10, 14, 12, 100, 12))).orderBy(col("day"))
      .collect()
    // day 9's trailing window contains the spike: median still 12 but
    // the spike sits in the array, not in day 8's own score
    assert(out(8).getAs[Double]("med") == 12.0)
    assert(out(7).getAs[Double]("med") == 12.0)
  }

  // ---- q201 positional attribution ----

  private def journeys(rows: Seq[(Long, String, Int, Long)]) =
    spark.createDataFrame(
      rows.map { case (c, ch, rk, n) => Row(c, ch, rk, n) }.asJava,
      StructType.fromDDL("conv_id BIGINT, channel STRING, rk INT, n BIGINT"))

  test("q201 hand-computed 3-touch journey: U = 0.4/0.2/0.4") {
    val out = Attribution.positionalCredit(journeys(Seq(
      (1L, "A", 1, 3L), (1L, "B", 2, 3L), (1L, "A", 3, 3L))))
      .orderBy(col("channel")).collect()
    val a = out(0); val b = out(1)
    assert(math.abs(a.getAs[Double]("credit_u") - 0.8) < 1e-9)
    assert(math.abs(b.getAs[Double]("credit_u") - 0.2) < 1e-9)
    assert(math.abs(a.getAs[Double]("credit_first") - 1.0) < 1e-9)
    assert(math.abs(a.getAs[Double]("credit_last") - 1.0) < 1e-9)
    assert(math.abs(a.getAs[Double]("credit_linear") - 2.0 / 3.0) < 1e-5)
  }

  test("q201 degenerate journeys: n = 1 full credit, n = 2 splits 0.5/0.5") {
    val out = Attribution.positionalCredit(journeys(Seq(
      (1L, "A", 1, 1L),
      (2L, "A", 1, 2L), (2L, "B", 2, 2L))))
      .orderBy(col("channel")).collect()
    assert(math.abs(out(0).getAs[Double]("credit_u") - 1.5) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("credit_u") - 0.5) < 1e-9)
  }

  test("q201 every scheme conserves total credit = conversions (mod 1e-6 quantization)") {
    val js = journeys(for {
      conv <- 1L to 5L
      rk <- 1 to 4
    } yield (conv, s"ch${rk % 3}", rk, 4L))
    val out = Attribution.positionalCredit(js).collect()
    for (scheme <- Seq("credit_linear", "credit_first", "credit_last", "credit_u")) {
      val total = out.map(_.getAs[Double](scheme)).sum
      assert(math.abs(total - 5.0) < 1e-4, scheme)
    }
  }

  // ---- q202 lower median ----

  private def kv(rows: Seq[(String, Long)]) =
    spark.createDataFrame(rows.map { case (k, v) => Row(k, v) }.asJava,
      StructType.fromDDL("k STRING, v BIGINT"))

  test("q202 lower median: odd, even, and duplicate-cell fixtures") {
    val out = DatasetCard.lowerMedianByKey(
      kv(Seq(("odd", 1L), ("odd", 3L), ("odd", 5L),
        ("even", 1L), ("even", 3L), ("even", 5L), ("even", 7L),
        ("dup", 2L), ("dup", 2L), ("dup", 2L), ("dup", 9L))),
      col("k"), col("v")).orderBy(col("key")).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("median_v")).toMap
    assert(out("odd") == 3L)
    assert(out("even") == 3L)
    assert(out("dup") == 2L)
  }
}
