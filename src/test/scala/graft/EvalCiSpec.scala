package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.{LiftGain, RateCi}

/** q216 Wilson/Newcombe CI and q217 lift/gains: textbook fixtures,
  * cleared-denominator exactness, and an IEEE-chain differential.
  */
class EvalCiSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // ---- q217 lift table ----

  private def lift(rows: Seq[(Long, Double, Long)]) =
    LiftGain.liftTable(
      spark.createDataFrame(
        rows.map { case (i, p, y) => Row(i, p, y) }.asJava,
        StructType.fromDDL("id BIGINT, p DOUBLE, y BIGINT")),
      col("id"), col("p"), col("y"))
      .collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("responders"),
          Option(r.get(r.fieldIndex("lift"))).map(_.asInstanceOf[Double]),
          Option(r.get(r.fieldIndex("cum_gain"))).map(_.asInstanceOf[Double]))))
      .toMap

  test("q217 perfect ranker: top decile lift 10, gains saturate at 1") {
    // 100 rows; the 10 highest scores are exactly the 10 responders
    val rows = (1L to 100L).map(i =>
      (i, 1000.0 - i, if (i <= 10) 1L else 0L))
    val out = lift(rows)
    assert(out(1L) == ((10L, 10L, Some(10.0), Some(1.0))))
    assert(out(5L)._3.contains(0.0))
    assert(out(10L)._4.contains(1.0))
  }

  test("q217 uniform ranker: lift exactly 1 in every decile") {
    // each block of 10 has exactly one responder at the same offset
    val rows = (1L to 100L).map(i => (i, 1000.0 - i, if (i % 10 == 3) 1L else 0L))
    val out = lift(rows)
    (1L to 10L).foreach { d =>
      assert(out(d)._3.contains(1.0), s"decile $d ${out(d)}")
      assert(out(d)._4.contains(d.toDouble / 10.0))
    }
  }

  test("q217 zero responders guard lift and gain to NULL") {
    val out = lift((1L to 50L).map(i => (i, i.toDouble, 0L)))
    out.values.foreach { case (_, s, l, g) =>
      assert(s == 0L && l.isEmpty && g.isEmpty)
    }
  }

  // ---- q216 rate CI ----

  private def rate(rows: Seq[(Long, Long)]) = {
    val r = RateCi.rateCi(
      spark.createDataFrame(rows.map { case (u, y) => Row(u, y) }.asJava,
        StructType.fromDDL("u BIGINT, y BIGINT")),
      col("u"), col("y")).collect()(0)
    (r.getAs[Long]("n_t"), r.getAs[Long]("s_t"),
      r.getAs[Long]("n_c"), r.getAs[Long]("s_c"),
      r.getAs[Double]("lo95"), r.getAs[Double]("hi95"),
      r.getAs[Boolean]("significant"))
  }

  test("q216 all-treatment-convert vs none: significant positive diff") {
    val rows = (1L to 400L).map(u => (u, if (armOf(u) == "t") 1L else 0L))
    val (nt, st, nc, sc, lo, hi, sig) = rate(rows)
    assert(st == nt && sc == 0L)
    assert(lo > 0.0 && sig)
    assert(!lo.isNaN && !hi.isNaN)
  }

  test("q216 identical rates: CI brackets zero, not significant") {
    // label every 3rd unit WITHIN its arm so both arm rates are
    // exactly ~1/3 regardless of how the md5 split lands
    var tSeen = 0L; var cSeen = 0L
    val rows = (1L to 3000L).map { u =>
      val y = if (armOf(u) == "t") { tSeen += 1; if (tSeen % 3 == 0) 1L else 0L }
      else { cSeen += 1; if (cSeen % 3 == 0) 1L else 0L }
      (u, y)
    }
    val (_, _, _, _, lo, hi, sig) = rate(rows)
    assert(lo < 0.0 && hi > 0.0 && !sig)
  }

  test("q216 matches an independent Wilson/Newcombe reimplementation") {
    val rows = (1L to 500L).map(u => (u, if (u % 4 == 1) 1L else 0L))
    val (nt, st, nc, sc, lo, hi, _) = rate(rows)
    def wilson(s: Long, n: Long): (Double, Double) = {
      val nD = n.toDouble; val p = s.toDouble / nD
      val z2 = 1.96 * 1.96
      val denom = 1.0 + z2 / nD
      val center = (p + z2 / (2.0 * nD)) / denom
      val half = 1.96 * math.sqrt(p * (1.0 - p) / nD
        + z2 / (4.0 * nD * nD)) / denom
      (center - half, center + half)
    }
    val pT = st.toDouble / nt.toDouble; val pC = sc.toDouble / nc.toDouble
    val (l1, u1) = wilson(st, nt); val (l2, u2) = wilson(sc, nc)
    val d = pT - pC
    val eLo = d - math.sqrt((pT - l1) * (pT - l1) + (u2 - pC) * (u2 - pC))
    val eHi = d + math.sqrt((u1 - pT) * (u1 - pT) + (pC - l2) * (pC - l2))
    assert(lo == eLo && hi == eHi)
  }

  private def armOf(u: Long): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (h < "80") "t" else "c"
  }
}
