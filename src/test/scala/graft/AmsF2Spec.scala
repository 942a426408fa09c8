package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.AmsF2

/** q272 AMS F2 calibration: the single-token exactness case, sign
  * derivation against an independent JVM md5, and the estimator's
  * error band on the corpus. (The oracle gate proves DuckDB replays
  * every Z_j; these pin the semantics.)
  */
class AmsF2Spec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val S = 16

  private def docs(rows: Seq[(String, String)]) =
    spark.createDataFrame(
      rows.map { case (src, text) => Row(src, text) }.asJava,
      StructType.fromDDL("source STRING, text STRING"))

  test("q272 is exact on a single-token vocabulary") {
    // one distinct token with count n: every Z_j = ±n, so every
    // estimator is n^2 = F2 exactly and the error is zero
    val out = AmsF2.report(docs(Seq("s1" -> (("tok " * 12).trim))))
      .collect().head
    assert(out.getLong(1) === 144L)       // f2_exact = 12^2
    assert(out.getLong(2) === 144L)       // est
    assert(out.getLong(3) === 0L)         // abs_err_pm
  }

  test("q272 estimate matches an independent JVM md5 sign derivation") {
    val texts = (1 to 25).map(i => s"word${i % 9} mid${i % 4} tail")
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = texts.flatMap(_.trim.split("\\s+"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val f2 = counts.values.map(c => c * c).sum
    val sNum = (0 until S).map { j =>
      val z = counts.map { case (tok, c) =>
        val hex = md.digest(tok.getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        val a = java.lang.Long.parseLong(hex.substring(0, 8), 16)
        if (((a >> j) & 1L) == 1L) c else -c
      }.sum
      z * z
    }.sum
    val out = AmsF2.report(docs(texts.map("s1" -> _))).collect().head
    assert(out.getLong(1) === f2)
    assert(out.getLong(2) === sNum / S)
    assert(out.getLong(3) === math.abs(sNum - S * f2) * 1000L / (S * f2))
    assert(out.getLong(4) === (if (sNum >= S * f2) 1L else -1L))
  }

  test("q272 error stays inside the 16-estimator band on the corpus") {
    // std of the 16-mean is <= F2/sqrt(8) ~ 354 per-mille; 2000 is a
    // ~5.7-sigma sanity band — the real audit is the oracle-exact value
    val rows = run("q272_ams_f2").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getLong(2) > 0L)
      assert(r.getLong(3) < 2000L,
        s"${r.getString(0)} err ${r.getLong(3)} outside band")
      assert(math.abs(r.getLong(4)) === 1L)
    }
  }
}
