package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.Sprt

/** q206 Wald SPRT: the exact decimal LLR ladder, boundary crossings,
  * and the decision rule on hand-built daily (n, s) series.
  */
class SequentialTestSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // the quantized coefficients the query uses (D18_6 = round half-up
  // at 6 decimals of the integer-argument lns)
  private def q6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  private val c1 = q6(math.log(26.0)) - q6(math.log(24.0)) //  0.080043
  private val c2 = q6(math.log(74.0)) - q6(math.log(76.0)) // -0.026668
  private val b  = q6(math.log(19.0))                      //  2.944439

  private def cells(rows: Seq[(String, Int, Long, Long)]) =
    spark.createDataFrame(
      rows.map { case (k, d, n, s) =>
        Row(k, Date.valueOf(f"2024-01-$d%02d"), n, s)
      }.asJava,
      StructType.fromDDL("key STRING, day DATE, n BIGINT, s BIGINT"))

  private def run(rows: Seq[(String, Int, Long, Long)]) =
    Sprt.sprt(cells(rows), col("key"), col("day"), col("n"), col("s"),
      24, 26, 100)
      .collect()
      .map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("s"),
          r.getAs[Double]("final_llr"),
          Option(r.getAs[Date]("h1_day")).map(_.toString),
          Option(r.getAs[Date]("h0_day")).map(_.toString),
          r.getAs[String]("decision"))))
      .toMap

  test("q206 LLR is the exact decimal ladder: s·c1 + (n−s)·c2") {
    // one day: n = 100, s = 50
    val out = run(Seq(("a", 1, 100L, 50L)))
    val want = (c1 * 50 + c2 * 50).toDouble
    assert(out("a")._3 == want)
    assert(out("a")._6 == "continue")
  }

  test("q206 all-success stream crosses the H1 boundary at the exact day") {
    // each day adds c1 ≈ 0.080043; crossing day = ceil(b / c1) = 37
    val days = (1 to 28).map(d => ("a", d, 1L, 1L))
    val out = run(days)
    assert(out("a")._4.isEmpty) // 28 · c1 = 2.241204 < b
    // pack more observations per day to cross inside January:
    // day d has 2 successes => cumulative 2d · c1 crosses b at d = 19
    val out2 = run((1 to 28).map(d => ("a", d, 2L, 2L)))
    val cross = (1 to 28).find(d => c1 * (2 * d) >= b).get
    assert(cross == 19)
    assert(out2("a")._4.contains(f"2024-01-$cross%02d"))
    assert(out2("a")._6 == "accept_h1")
  }

  test("q206 all-failure stream accepts H0 once −llr clears the boundary") {
    // each failure adds c2 ≈ -0.026668; need d with d·|c2| ≥ b
    val need = (1 to 2000).find(d => -c2 * d >= b).get // 111
    val out = run((1 to 28).map(d => ("a", d, 5L, 0L)))
    val cross = (1 to 28).find(d => -c2 * (5 * d) >= b).get // day 23
    assert(5 * cross >= need && need > 5 * (cross - 1))
    assert(out("a")._5.contains(f"2024-01-$cross%02d"))
    assert(out("a")._6 == "accept_h0")
  }

  test("q206 keys are independent and final_llr reads the last day") {
    val out = run(Seq(
      ("a", 1, 10L, 10L), ("a", 2, 10L, 0L),
      ("b", 1, 4L, 2L)))
    val wantA = (c1 * 10 + c2 * 10).toDouble
    assert(out("a")._3 == wantA)
    assert(out("a")._1 == 20L && out("a")._2 == 10L)
    assert(out("b")._3 == (c1 * 2 + c2 * 2).toDouble)
  }

  test("q206 earlier H1 crossing wins even if H0 would cross later") {
    // surge of successes then a long failure run: H1 day < H0 day
    val rows = Seq.tabulate(25)(i => ("a", i + 1, 40L, if (i < 3) 40L else 0L))
    val out = run(rows)
    assert(out("a")._4.isDefined)
    assert(out("a")._6 == (if (out("a")._5.isEmpty ||
      out("a")._4.get <= out("a")._5.get) "accept_h1" else "accept_h0"))
    assert(out("a")._6 == "accept_h1")
  }
}
