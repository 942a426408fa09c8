package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch decomposition profiler for the round-14 targets: times the
  * LEGS of q179 / q210 separately in one warmed JVM so the optimization
  * effort lands where the seconds are (guide §1.1). Usage:
  *   runMain graft.tools.PartsProf <sfDir> <q179|q210> [reps]
  * Measurement scaffolding only — not a query path.
  */
object PartsProf {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, sfDir)

    def time(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      println(f"[parts] $name sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    for (rep <- 1 to reps) {
      println(s"[parts] ---- rep $rep ----")
      spark.catalog.clearCache()
      which match {
        case "q179" =>
          val edges = graft.queries.KCore.coEdges(
            t.lineitem.select(col("l_orderkey"), col("l_partkey")),
            "l_orderkey", "l_partkey", 2)
          time("edge_build_count")(edges.count(): Unit)
          spark.catalog.clearCache()
          time("full_q179")(
            graft.Registry.byName("q179_kcore_peel").run(spark, sfDir).count(): Unit)
        case "q210" =>
          // replicate the internals of Conformal.conformal leg by leg
          val base = graft.CacheScope.trackedCache(
            t.lineitem.select(col("l_returnflag").as("seg"),
              (col("l_orderkey") * 10 + col("l_linenumber")).as("graft_id"),
              col("l_quantity").as("graft_x"), col("l_extendedprice").as("graft_y"))
              .withColumn("graft_u", md5(col("graft_id").cast("string")))
              .withColumn("graft_split",
                when(col("graft_u") < "55", "train")
                  .when(col("graft_u") < "aa", "cal")
                  .otherwise("test"))
              .select(col("seg"), col("graft_x"), col("graft_y"), col("graft_split")))
          time("base_cache_build")(base.count(): Unit)
          val det = graft.functions.det
          val fit = base.filter(col("graft_split") === "train")
            .groupBy(col("seg"))
            .agg(count(lit(1)).as("n_train"),
              det.dsumw(col("graft_x")).as("sx"),
              det.dsumw(col("graft_y")).as("sy"),
              det.dsumw(col("graft_x") * col("graft_x")).as("sxx"),
              det.dsumw(col("graft_x") * col("graft_y")).as("sxy"))
          time("fit_agg")(fit.count(): Unit)
          val fit2 = fit
            .select(col("seg"), col("n_train"),
              ((col("n_train").cast("double") * col("sxy") - col("sx") * col("sy"))
                / (col("n_train").cast("double") * col("sxx") - col("sx") * col("sx"))).as("slope"),
              col("sx"), col("sy"))
            .select(col("seg"), col("n_train"), col("slope"),
              ((col("sy") - col("slope") * col("sx"))
                / col("n_train").cast("double")).as("intercept"))
          val calR = base.filter(col("graft_split") === "cal")
            .join(broadcast(fit2), Seq("seg"))
            .withColumn("graft_r",
              abs(col("graft_y") - (col("intercept")
                + col("slope") * col("graft_x"))).cast(det.D18_6))
          val calCells = calR.groupBy(col("seg"), col("graft_r"))
            .agg(count(lit(1)).as("graft_c"))
          time("cal_cells_agg")(calCells.count(): Unit)
          time("full_q210")(
            graft.Registry.byName("q210_conformal_interval").run(spark, sfDir).count(): Unit)
      }
    }
    spark.stop()
  }
}
