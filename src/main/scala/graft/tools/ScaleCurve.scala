package graft.tools

import graft.{GraftSession, Registry}

/** Scale-curve measurement (VERDICT r10 next #8): times a set of
  * queries at two (or more) scale factors and reports each query's
  * wall-time growth exponent, converting the scaladoc claims of the
  * iterative tier ("round overhead is constant in SF", "per-edge
  * throughput") into measured evidence. exponent =
  * log(t_hi / t_lo) / log(sf_hi / sf_lo): 1.0 = linear, < 1 =
  * overhead-dominated at the low SF, > 1 = super-linear (a stage to
  * fix).
  *
  * Timing protocol matches Bench where it matters for a RATIO: warm
  * each query once per sfDir (codegen + page cache), then two timed
  * passes, per-query MIN. Run it like
  * `sbt "runMain graft.tools.ScaleCurve /root/testdata/sf0.1 <sf1dir> 10 q179_kcore_peel ..."`
  * (third arg = sf_hi / sf_lo ratio).
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ScaleCurve <sfDirLo> <sfDirHi> <sfRatio> <query>...")
    val (dirLo, dirHi, ratio) = (args(0), args(1), args(2).toDouble)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, dir: String): Double = {
      val q = Registry.byName(name)
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(s"warmup:$name")
      q.run(spark, dir).count() // warm: codegen, page cache
      val times = (1 to 2).map { pass =>
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(s"timed$pass:$name")
        val t0 = System.nanoTime()
        q.run(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      times.min
    }

    val rows = names.map { n =>
      val lo = time(n, dirLo)
      val hi = time(n, dirHi)
      val exp = math.log(hi / lo) / math.log(ratio)
      (n, lo, hi, exp)
    }
    val body = rows.map { case (n, lo, hi, e) =>
      f""""$n":{"lo_sec":$lo%.3f,"hi_sec":$hi%.3f,"exponent":$e%.3f}"""
    }.mkString(",")
    println(s"""{"metric":"scale_curve","sf_lo":"$dirLo","sf_hi":"$dirHi","ratio":$ratio,"queries":{$body}}""")
    spark.stop()
  }
}
