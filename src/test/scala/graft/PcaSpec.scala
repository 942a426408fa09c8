package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.PcaPower

/** q208 power-iteration PCA: known eigenstructures recovered exactly.
  */
class PcaSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[(Double, Double, Double, Double)]) =
    spark.createDataFrame(
      rows.map { case (a, b, c, d) => Row(a, b, c, d) }.asJava,
      StructType.fromDDL("a DOUBLE, b DOUBLE, c DOUBLE, d DOUBLE"))

  private def run(rows: Seq[(Double, Double, Double, Double)]) =
    PcaPower.pca4(df(rows), col("a"), col("b"), col("c"), col("d")).collect()(0)

  test("q208 perfectly correlated pair dominates: v loads equally on it") {
    // a == b exactly; c, d independent-ish noise axes. The top
    // eigenvector of the correlation matrix concentrates on (a, b).
    val rows = Seq.tabulate(64) { i =>
      val x = (i % 8).toDouble
      val c = ((i / 8) % 4).toDouble       // varies independently
      val d = ((i * 5) % 7).toDouble
      (x, x, c, d)
    }
    val r = run(rows)
    val (v1, v2) = (r.getAs[Double]("v1"), r.getAs[Double]("v2"))
    // identical columns must get identical loadings, and the pair axis
    // must carry more weight than either noise axis
    assert(v1 == v2, s"v1=$v1 v2=$v2")
    assert(math.abs(v1) > math.abs(r.getAs[Double]("v3")))
    assert(math.abs(v1) > math.abs(r.getAs[Double]("v4")))
    // r(a,b) = 1 implies lambda >= 2 (the pair contributes a 2-block)
    assert(r.getAs[Double]("eigenvalue") > 1.9)
    assert(r.getAs[Double]("explained_share") ==
      r.getAs[Double]("eigenvalue") / 4.0)
  }

  test("q208 anti-correlated pair loads with opposite signs") {
    val rows = Seq.tabulate(64) { i =>
      val x = (i % 8).toDouble
      (x, -x, ((i / 8) % 4).toDouble, ((i * 3) % 5).toDouble)
    }
    val r = run(rows)
    assert(r.getAs[Double]("v1") * r.getAs[Double]("v2") < 0)
    assert(r.getAs[Double]("eigenvalue") > 1.9)
  }

  test("q208 eigenvector is unit length and iteration is deterministic") {
    val rows = Seq.tabulate(100) { i =>
      ((i % 10).toDouble, ((i * 7) % 13).toDouble,
        ((i * 3) % 11).toDouble, ((i * 5) % 9).toDouble)
    }
    val r1 = run(rows)
    val r2 = run(rows)
    val n2 = (1 to 4).map(i => {
      val v = r1.getAs[Double](s"v$i"); v * v
    }).sum
    assert(math.abs(n2 - 1.0) < 1e-12, s"|v|^2 = $n2")
    (1 to 4).foreach { i =>
      assert(r1.getAs[Double](s"v$i") == r2.getAs[Double](s"v$i"))
    }
  }

  test("q208 eigenvalue is within the correlation-matrix spectrum bounds") {
    val rows = Seq.tabulate(64) { i =>
      ((i % 8).toDouble, ((i * 7) % 13).toDouble,
        ((i * 3) % 11).toDouble, ((i * 5) % 9).toDouble)
    }
    val lam = run(rows).getAs[Double]("eigenvalue")
    assert(lam >= 1.0 - 1e-9 && lam <= 4.0 + 1e-9, s"lambda $lam")
  }
}
