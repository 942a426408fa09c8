package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.JlDistortion

/** q275 JL distortion: a hand-computable projection case, the
  * zero-distance guard, and the concentration of the histogram
  * around ratio 1 on the corpus sample.
  */
class JlDistortionSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def vecs(rows: Seq[(Long, Seq[Double])]) =
    spark.createDataFrame(
      rows.map { case (id, v) => Row(id, v) }.asJava,
      StructType.fromDDL("vec_id BIGINT, v ARRAY<DOUBLE>"))

  test("identical vectors are excluded by the zero-distance guard") {
    val v = (1 to 64).map(_.toDouble / 64)
    // two identical + one distinct: only the 2 cross pairs survive
    val out = JlDistortion.audit(vecs(Seq(
      1L -> v, 2L -> v, 3L -> v.map(_ * 2.0)))).collect()
    assert(out.map(_.getLong(1)).sum === 2L)
  }

  test("a duplicated pair with known geometry lands in one bucket") {
    // orthogonal-ish pair: distortion is whatever the planes give,
    // but BOTH pairs (1,3) and (2,3) are identical by construction,
    // so they land in the same bucket with the same ratio
    val v = (1 to 64).map(_.toDouble / 64)
    val out = JlDistortion.audit(vecs(Seq(
      1L -> v, 2L -> v, 3L -> v.map(_ * 2.0)))).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(3) === out.head.getDouble(4)) // min == max
  }

  test("q275 on the corpus: 2016 pairs, mass concentrated near ratio 1") {
    val rows = run("q275_jl_distortion").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total === 64L * 63L / 2L)
    // JL at k=32: std ~ sqrt(2/32) = 250 per-mille; buckets 5..15
    // (ratio 0.5 - 1.6) must hold the overwhelming mass
    val near = rows.filter(r => r.getLong(0) >= 5L && r.getLong(0) <= 15L)
      .map(_.getLong(1)).sum
    assert(near.toDouble / total > 0.95, s"only $near/$total near 1")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0)
      assert(r.getDouble(3) <= r.getDouble(4))
    }
  }
}
