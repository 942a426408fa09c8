package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.HllCal

/** q262 HLL calibration: register arithmetic cross-checked against an
  * independent JVM md5 implementation, duplicate collapse, the
  * linear-counting branch, and estimator accuracy at sketch scale.
  * (The oracle gate proves DuckDB replays every register; these pin
  * the semantics.)
  */
class HllCalSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val M = 1024L

  private def docs(rows: Seq[(String, String)]) =
    spark.createDataFrame(
      rows.map { case (src, text) => Row(src, text) }.asJava,
      StructType.fromDDL("source STRING, text STRING"))

  /** Independent register derivation: JVM MessageDigest md5, not
    * Spark's md5() — same bytes in must give the same registers.
    */
  private def expected(texts: Seq[String]): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = scala.collection.mutable.Map.empty[Long, Long]
    texts.distinct.foreach { t =>
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      val a = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val w = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      val rho = if (w == 0) 33L
        else 33L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      val b = a % M
      regs(b) = math.max(regs.getOrElse(b, 0L), rho)
    }
    val vEmpty = M - regs.size
    val sPrime = regs.values.map(r => 1L << (33 - r)).sum + vEmpty * (1L << 33)
    (vEmpty, sPrime)
  }

  test("q262 registers match an independent JVM md5 derivation; duplicates collapse") {
    val texts = (1 to 40).map(i => s"doc body number $i with words")
    // each text planted twice: distinct-collapse must make the
    // duplicate invisible to both the registers and n_exact
    val out = HllCal.report(docs(texts.flatMap(t => Seq("s1" -> t, "s1" -> t))))
      .collect().head
    val (v, sp) = expected(texts)
    assert(out.getLong(1) == 40L, s"n_exact: $out")
    assert(out.getLong(2) == v, s"v_empty want $v: $out")
    assert(out.getLong(3) == sp, s"s_prime want $sp: $out")
  }

  test("q262 small source takes the linear-counting branch exactly") {
    val out = HllCal.report(docs((1 to 25).map(i => "s" -> s"tiny doc $i")))
      .collect().head
    val v = out.getLong(2)
    val expect = BigDecimal(1024.0 * math.log(1024.0 / v.toDouble))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.getDouble(4) - expect) < 5e-4,
      s"linear-counting estimate want ~$expect: $out")
  }

  test("q262 estimator lands within the published error band at sketch scale") {
    val texts = (1 to 5000).map(i => s"corpus document $i body text")
    val out = HllCal.report(docs(texts.map("big" -> _))).collect().head
    assert(out.getLong(1) == 5000L)
    // sigma = 1.04/sqrt(1024) ~ 3.3%; 15% is a 4.5-sigma ceiling that
    // catches a broken register path without flaking
    assert(math.abs(out.getDouble(5)) < 0.15,
      s"rel_err ${out.getDouble(5)} outside the HLL error band: $out")
  }

  test("q262 real corpus: every source within 15% after correction") {
    val rows = run("q262_hll_cal").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(5)) < 0.15,
        s"source ${r.getString(0)} rel_err ${r.getDouble(5)}")
    }
  }
}
