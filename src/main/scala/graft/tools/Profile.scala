package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time one registered query N times.
  * Usage: runMain graft.tools.Profile <sfDir> <queryName> [reps] [clearCache]
  * Pass clearCache=true to drop operator caches between reps — the
  * bench-faithful mode (without it, a query's own trackedCache frames
  * survive into the next rep and hide their build cost).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val clear = args.length > 3 && args(3).toBoolean
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to reps) {
      if (clear) spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.Registry.byName(name).run(spark, sfDir).count()
      println(f"PROFILE $name rep=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
