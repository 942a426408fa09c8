package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.Zipf

/** q207 Zipf fit: an exact power law recovers its exponent with
  * r² ≈ 1, ties rank deterministically, the top-K cap holds, and the
  * degenerate guards fire.
  */
class CorpusLawSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def counts(rows: Seq[(String, String, Long)]) =
    spark.createDataFrame(
      rows.map { case (k, t, f) => Row(k, t, f) }.asJava,
      StructType.fromDDL("key STRING, token STRING, f BIGINT"))

  private def fit(rows: Seq[(String, String, Long)], k: Int = 50) =
    Zipf.zipfFit(counts(rows), col("key"), col("f"), col("token"), k)
      .collect()
      .map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n_points"),
          Option(r.get(r.fieldIndex("slope"))).map(_.asInstanceOf[Double]),
          Option(r.get(r.fieldIndex("r2"))).map(_.asInstanceOf[Double]))))
      .toMap

  test("q207 exact 1/r law: slope -1, r2 ~ 1") {
    // f = 840 / r for r = 1..8 — all integers, exactly Zipfian
    val fs = Seq(840L, 420L, 280L, 210L, 168L, 140L, 120L, 105L)
    val rows = fs.zipWithIndex.map { case (f, i) => ("en", f"t$i%02d", f) }
    val out = fit(rows)("en")
    assert(out._1 == 8L)
    assert(math.abs(out._2.get + 1.0) < 1e-4, s"slope ${out._2}")
    assert(out._3.get > 1.0 - 1e-6, s"r2 ${out._3}")
  }

  test("q207 steeper law recovers its exponent: f = C/r^2 -> slope -2") {
    // C = 7!^2 guarantees integer f for r = 1..6
    val c = 25401600L
    val rows = (1 to 6).map(r => ("en", f"t$r%02d", c / (r.toLong * r)))
    val out = fit(rows)("en")
    assert(math.abs(out._2.get + 2.0) < 1e-4, s"slope ${out._2}")
  }

  test("q207 all-equal frequencies: slope exactly 0, r2 guarded NULL") {
    val rows = (1 to 6).map(i => ("en", s"t$i", 10L))
    val out = fit(rows)("en")
    assert(out._2.contains(0.0))
    assert(out._3.isEmpty)
  }

  test("q207 top-K cap and per-key independence") {
    val big = (1 to 30).map(i => ("en", f"t$i%02d", (1000 - i).toLong))
    val other = Seq(("de", "a", 100L), ("de", "b", 50L))
    val out = fit(big ++ other, k = 10)
    assert(out("en")._1 == 10L)
    assert(out("de")._1 == 2L)
    // two points fit exactly: r2 = 1
    assert(out("de")._3.exists(v => math.abs(v - 1.0) < 1e-9))
  }

  test("q207 single point: every statistic guards to NULL") {
    val out = fit(Seq(("en", "only", 42L)))("en")
    assert(out._1 == 1L && out._2.isEmpty && out._3.isEmpty)
  }
}
