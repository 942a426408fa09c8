package graft

import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.Cuped

/** q211 CUPED: perfect-covariate collapse, planted-lift recovery
  * through the real md5 arm split, the zero-variance guard, and
  * bit-exact determinism.
  */
class CupedSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[(Long, Double, Double)]) =
    spark.createDataFrame(
      rows.map { case (u, x, y) => Row(u, x, y) }.asJava,
      StructType.fromDDL("u BIGINT, x DOUBLE, y DOUBLE"))

  private def run(rows: Seq[(Long, Double, Double)]) = {
    val r = Cuped.cuped(df(rows), col("u"), col("x"), col("y")).collect()(0)
    (r.getAs[Long]("n_t"), r.getAs[Long]("n_c"),
      Option(r.get(r.fieldIndex("theta"))).map(_.asInstanceOf[Double]),
      r.getAs[Double]("effect_raw"),
      Option(r.get(r.fieldIndex("effect_cuped"))).map(_.asInstanceOf[Double]),
      Option(r.get(r.fieldIndex("var_reduction"))).map(_.asInstanceOf[Double]))
  }

  private def armOf(u: Long): String = {
    val h = MessageDigest.getInstance("MD5").digest(u.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (h < "80") "t" else "c"
  }

  test("q211 perfect covariate y = 2x + 5: theta 2, cuped effect 0, rho2 1") {
    val rows = (1L to 200L).map(u => (u, (u % 23).toDouble,
      2.0 * (u % 23) + 5.0))
    val (nt, nc, theta, _, cuped, vr) = run(rows)
    assert(nt + nc == 200L)
    assert(math.abs(theta.get - 2.0) < 1e-9)
    assert(math.abs(cuped.get) < 1e-9)
    assert(vr.get > 1.0 - 1e-9)
  }

  test("q211 planted lift on the real arm split is recovered by CUPED") {
    val rows = (1L to 500L).map { u =>
      val x = (u % 31).toDouble * 2.0
      val lift = if (armOf(u) == "t") 10.0 else 0.0
      (u, x, x + lift)
    }
    val (nt, nc, _, raw, cuped, vr) = run(rows)
    assert(nt > 0 && nc > 0)
    // raw carries arm imbalance in X; CUPED strips it
    assert(math.abs(cuped.get - 10.0) < 0.2, s"cuped $cuped raw $raw")
    assert(math.abs(cuped.get - 10.0) <= math.abs(raw - 10.0) + 1e-12)
    assert(vr.get > 0.9)
  }

  test("q211 zero-variance covariate guards theta/cuped/rho2 to NULL") {
    val rows = (1L to 100L).map(u => (u, 7.0, (u % 5).toDouble))
    val (_, _, theta, raw, cuped, vr) = run(rows)
    assert(theta.isEmpty && cuped.isEmpty && vr.isEmpty)
    assert(!raw.isNaN)
  }

  test("q211 runs are bit-identical") {
    val rows = (1L to 300L).map(u => (u, (u % 13).toDouble,
      (u % 7).toDouble + 0.5 * (u % 13)))
    val a = run(rows); val b = run(rows)
    assert(a == b)
  }
}
