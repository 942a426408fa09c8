package graft

/** q224 Spearman: the defining invariances — monotone-transform
  * equality, perfect rank agreement/reversal, and the tie-corrected
  * average-rank arithmetic on a hand-built tie fixture.
  */
class SpearmanSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  /** Inline replica of q224's rank+moment chain over (key, x, y). */
  private def rho(rows: Seq[(String, Double, Double)]): Map[String, Double] = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      rows.map { case (k, x, y) => Row(k, x, y) }.asJava,
      StructType.fromDDL("key STRING, x DOUBLE, y DOUBLE"))
    val wx = Window.partitionBy(col("key")).orderBy(col("x"))
    val wy = Window.partitionBy(col("key")).orderBy(col("y"))
    val r = df.select(col("key"),
      (lit(2L) * rank().over(wx)
        + count(lit(1)).over(Window.partitionBy(col("key"), col("x"))) - 1L).as("rx"),
      (lit(2L) * rank().over(wy)
        + count(lit(1)).over(Window.partitionBy(col("key"), col("y"))) - 1L).as("ry"))
    def s(c: org.apache.spark.sql.Column) =
      sum(c.cast(graft.functions.det.D28_6)).cast("double")
    val m = r.groupBy(col("key")).agg(count(lit(1)).as("n"),
      s(col("rx")).as("sx"), s(col("ry")).as("sy"),
      s(col("rx") * col("rx")).as("sxx"),
      s(col("rx") * col("ry")).as("sxy"),
      s(col("ry") * col("ry")).as("syy"))
    val nd = col("n").cast("double")
    val dx = nd * col("sxx") - col("sx") * col("sx")
    val dy = nd * col("syy") - col("sy") * col("sy")
    m.select(col("key"),
      ((nd * col("sxy") - col("sx") * col("sy")) / (sqrt(dx) * sqrt(dy))).as("rho"))
      .collect().map(r0 => r0.getString(0) -> r0.getDouble(1)).toMap
  }

  test("q224 perfect monotone agreement is +1, reversal is -1, and rho is transform-invariant") {
    val xs = Seq(1.0, 3.0, 7.0, 20.0, 55.0)
    val up = rho(xs.map(v => ("k", v, v * v)))            // monotone map of x
    val down = rho(xs.map(v => ("k", v, 1.0 / v)))        // antitone map
    assert(math.abs(up("k") - 1.0) < 1e-12)
    assert(math.abs(down("k") + 1.0) < 1e-12)
    // invariance: rho(x, y) == rho(log-ish monotone rescale of x, y)
    val a = rho(Seq(("k", 1.0, 9.0), ("k", 2.0, 3.0), ("k", 3.0, 7.0), ("k", 4.0, 1.0)))
    val b = rho(Seq(("k", 10.0, 9.0), ("k", 200.0, 3.0), ("k", 3000.0, 7.0), ("k", 40000.0, 1.0)))
    assert(a("k") == b("k"), "rho not invariant under monotone rescale of x")
  }

  test("q224 tie fixture matches the hand-computed tie-corrected value") {
    // x = (1, 2, 2, 3), y = (1, 2, 3, 4): average x-ranks (1, 2.5, 2.5, 4)
    // -> 2r = (2, 5, 5, 8); y 2r = (2, 4, 6, 8). Hand Pearson over those:
    // n=4 sx=20 sy=20 sxx=118 syy=120 sxy=118 -> rho = (472-400)/sqrt((472-400)(480-400))
    val got = rho(Seq(("k", 1.0, 1.0), ("k", 2.0, 2.0), ("k", 2.0, 3.0), ("k", 3.0, 4.0)))("k")
    val want = (4.0 * 118 - 20 * 20) /
      (math.sqrt(4.0 * 118 - 400) * math.sqrt(4.0 * 120 - 400))
    assert(got == want, s"got $got want $want")
  }

  test("q224 on the corpus emits one finite rho per segment") {
    val out = run("q224_spearman").collect()
    assert(out.length == 5)
    out.foreach { r =>
      val v = r.getDouble(2)
      assert(!v.isNaN && v >= -1.0 && v <= 1.0, s"rho out of range: $v")
    }
  }
}
