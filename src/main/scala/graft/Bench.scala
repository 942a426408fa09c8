package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall times.
  *
  * Fidelity rules (VERDICT r1 "What's wrong" #2): queries run in the
  * fixed Registry order; a warmup pass absorbs JVM/codegen startup so
  * the first timed query isn't charged for it; failures are reported
  * per-query in an "errors" field (value -1) instead of being silently
  * timed, and the process exits non-zero if anything failed.
  *
  * Noise canary (VERDICT r4 #5): the same fixed calibration query is
  * timed right after warmup and again after the last query, and the
  * JSON carries both times plus `canary_drift` = max/min of the two.
  * The per-query 2× gate cannot tell machine contention from a real
  * regression (BENCH_r04 flagged 8 untouched queries purely from
  * load); a drifted canary makes a noisy run self-identifying — the
  * discard rule lives in BASELINE.md.
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

    val canaryName = "q01_agg_pushdown"
    def canaryTime(): Double = {
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription("canary")
      val t0 = System.nanoTime()
      Registry.byName(canaryName).run(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val canaryStart = canaryTime()

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

    val canaryEnd = canaryTime()
    val drift = math.max(canaryStart, canaryEnd) / math.min(canaryStart, canaryEnd)

    val qs = results.map { case (n, s, _) => s""""$n":$s""" }.mkString("{", ",", "}")
    val errs = results.collect { case (n, _, Some(e)) => s""""$n":"$e"""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, s, None) => s }.sum
    val canary = s"""{"query":"$canaryName","start_sec":$canaryStart,""" +
      s""""end_sec":$canaryEnd,"drift":$drift}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"canary":$canary,"canary_drift":$drift,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.nonEmpty)) sys.exit(1)
  }
}
