package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.Mixture

/** q184 mixture planner: hand-computed 9:1 tempering, the uniform
  * fixed point, boost monotonicity, and share conservation.
  */
class MixtureSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def plan(masses: Seq[(String, Long)]) = {
    val df = spark.createDataFrame(
      masses.map { case (d, m) => Row(d, m) }.asJava,
      StructType.fromDDL("dom STRING, m LONG"))
    Mixture.plan(df, Seq("dom"), "m")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
  }

  test("q184 9:1 masses temper to 3:1 shares") {
    val out = plan(Seq(("head", 900L), ("tail", 100L)))
    // sqrt: 30, 10 (quantized exactly) -> z = 40
    assert(out("head")._2 == 0.9 && out("tail")._2 == 0.1)
    assert(out("head")._3 == 0.75 && out("tail")._3 == 0.25)
    // boosts: 0.75/0.9 < 1 (downsampled head), 0.25/0.1 > 1 (upsampled tail)
    assert(out("head")._4 < 1.0 && out("tail")._4 > 1.0)
  }

  test("q184 uniform mixture is a fixed point") {
    val out = plan(Seq(("a", 500L), ("b", 500L), ("c", 500L), ("d", 500L)))
    // tolerance: the D20_6 quantization of sqrt(500) shifts the
    // normalizer by ~1e-7 absolute, so shares are exact to ~1e-8
    out.values.foreach { case (_, pRaw, pT, boost) =>
      assert(pRaw == 0.25 && math.abs(pT - 0.25) < 1e-7)
      assert(math.abs(boost - 1.0) < 1e-7)
    }
  }

  test("q184 boost decreases monotonically with mass") {
    val out = plan(Seq(("a", 10L), ("b", 100L), ("c", 1000L), ("d", 10000L)))
    val boosts = Seq("a", "b", "c", "d").map(out(_)._4)
    assert(boosts == boosts.sorted.reverse)
  }

  test("q184 tempered shares sum to ~1 and raw shares exactly partition") {
    val rnd = new scala.util.Random(184184L)
    val masses = (1 to 20).map(i => (s"d$i", rnd.nextInt(100000).toLong + 1))
    val out = plan(masses)
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-9)
    assert(out.values.map(_._1).sum == masses.map(_._2).sum)
  }
}
