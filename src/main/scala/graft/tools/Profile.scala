package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time one registered query N times.
  * Usage: runMain graft.tools.Profile <sfDir> <queryName> [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.Registry.byName(name).run(spark, sfDir).count()
      println(f"PROFILE $name rep=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
