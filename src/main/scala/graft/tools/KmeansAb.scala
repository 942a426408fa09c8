package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scratch A/B harness for the q253 shape decision (VERDICT r13 #1):
  * the round-13 fused per-round aggregate profiled 5× faster than the
  * old fat-cache two-pass shape in tools.Profile but benched SLOWER
  * (5.67 → 6.5 s) under the real protocol — so this tool times the
  * candidate shapes interleaved in ONE warmed JVM, several reps each,
  * operator caches cleared between reps (the bench-faithful mode),
  * and reports min/median per shape. Usage:
  *   runMain graft.tools.KmeansAb <sfDir> [reps]
  * Not a query path — measurement scaffolding only.
  */
object KmeansAb {

  private val K = 8
  private val Rounds = 3
  private val Dims = 64
  private val Scale = 1000
  private val Offset = 4000L

  private def qvOf(e: DataFrame): DataFrame =
    graft.CacheScope.trackedCache(e.select(col("vec_id"),
      expr(s"transform(v, x -> cast(floor(x * $Scale) as bigint) + $Offset)")
        .as("qv")))

  private def initOf(qv: DataFrame): Seq[(Long, IndexedSeq[Long])] =
    qv.orderBy(col("vec_id")).limit(K).collect().zipWithIndex
      .map { case (r, i) => i.toLong -> r.getSeq[Long](1).toIndexedSeq }.toSeq

  private def distTo(cv: IndexedSeq[Long]): Column = (1 to Dims).map { i =>
    val d = element_at(col("qv"), i) - lit(cv(i - 1)); d * d
  }.reduce(_ + _)

  /** Shape A: the round-13 fused per-round aggregate (current code). */
  private def shapeA(e: DataFrame): DataFrame = graft.queries.KmeansAudit.audit(e)

  /** Shape B: the pre-round-13 fat-cache two-pass rounds. */
  private def shapeB(e: DataFrame): DataFrame = {
    val qv = qvOf(e)
    var centroids = initOf(qv)
    var reports = Seq.empty[DataFrame]
    (1 to Rounds).foreach { r =>
      val ks = centroids.map(_._1)
      val distCols = centroids.map { case (k, cv) => distTo(cv).as(s"d$k") }
      val minDist = ks.map(k => col(s"d$k")).reduce((a, b) => least(a, b))
      val bestK = ks.sorted.tail.foldLeft(
        when(col(s"d${ks.sorted.head}") === col("graft_min"),
          lit(ks.sorted.head))) { (acc, k) =>
        acc.when(col(s"d$k") === col("graft_min"), lit(k))
      }
      val assigned = graft.CacheScope.trackedCache(
        qv.select(col("vec_id") +: col("qv") +: distCols: _*)
          .withColumn("graft_min", minDist)
          .select(col("vec_id"), col("qv"), bestK.as("k"),
            col("graft_min").as("dist")))
      reports = reports :+ assigned.groupBy(col("k"))
        .agg(count(lit(1)).as("n_points"),
          sum(col("dist")).cast("long").as("inertia"))
        .select(lit(r.toLong).as("round"), col("k").as("cluster"),
          col("n_points"), col("inertia"))
      if (r < Rounds) {
        val dimSums = (1 to Dims).map(i =>
          sum(element_at(col("qv"), i)).cast("long").as(s"s$i"))
        val agg = assigned.groupBy(col("k"))
          .agg(count(lit(1)).cast("long").as("n"), dimSums: _*)
          .collect()
        centroids = agg.map { row =>
          val k = row.getLong(0)
          val n = row.getLong(1)
          k -> (1 to Dims).map(i => Math.floorDiv(row.getLong(1 + i), n))
            .toIndexedSeq
        }.toSeq.sortBy(_._1)
      }
    }
    reports.reduce(_ unionAll _)
      .withColumn("mean_dist",
        col("inertia").cast("double") / col("n_points").cast("double"))
      .orderBy(col("round"), col("cluster"))
  }

  /** Shape C: fused pass, but assignment via ONE least(struct(dist, k))
    * so each distance chain appears exactly once in the projection
    * (the CASE spelling re-inlines every chain into the tie-break;
    * physical CSE is supposed to dedup them — C measures whether it
    * actually does).
    */
  private def shapeC(e: DataFrame): DataFrame = {
    val qv = qvOf(e)
    var centroids = initOf(qv)
    var reportRows = Seq.empty[(Long, Long, Long, Long)]
    (1 to Rounds).foreach { r =>
      val best = least(centroids.sortBy(_._1).map { case (k, cv) =>
        struct(distTo(cv).as("d"), lit(k).as("k"))
      }: _*)
      val dimSums =
        if (r < Rounds) (1 to Dims).map(i =>
          sum(element_at(col("qv"), i)).cast("long").as(s"s$i"))
        else Seq.empty
      val agg = qv.select(col("qv"), best.as("graft_best"))
        .groupBy(col("graft_best.k").as("k"))
        .agg(count(lit(1)).cast("long").as("n"),
          (sum(col("graft_best.d")).cast("long").as("inertia") +: dimSums): _*)
        .collect()
      reportRows = reportRows ++ agg.map { row =>
        (r.toLong, row.getLong(0), row.getLong(1), row.getLong(2))
      }.sortBy(t => (t._1, t._2))
      if (r < Rounds) {
        centroids = agg.map { row =>
          val k = row.getLong(0)
          val n = row.getLong(1)
          k -> (1 to Dims).map(i => Math.floorDiv(row.getLong(2 + i), n))
            .toIndexedSeq
        }.toSeq.sortBy(_._1)
      }
    }
    import qv.sparkSession.implicits._
    reportRows.toDF("round", "cluster", "n_points", "inertia")
      .withColumn("mean_dist",
        col("inertia").cast("double") / col("n_points").cast("double"))
      .orderBy(col("round"), col("cluster"))
  }

  /** Shape D: two-pass rounds with a SLIM cache (no vec_id — nothing
    * downstream reads it) and NO cache in the final round (its only
    * consumer is the (n, inertia) report rollup, so the fat qv column
    * is written for nothing — aggregate directly).
    */
  private def shapeD(e: DataFrame): DataFrame = {
    val qv = qvOf(e)
    var centroids = initOf(qv)
    var reports = Seq.empty[DataFrame]
    (1 to Rounds).foreach { r =>
      val ks = centroids.map(_._1)
      val distCols = centroids.map { case (k, cv) => distTo(cv).as(s"d$k") }
      val minDist = ks.map(k => col(s"d$k")).reduce((a, b) => least(a, b))
      val bestK = ks.sorted.tail.foldLeft(
        when(col(s"d${ks.sorted.head}") === col("graft_min"),
          lit(ks.sorted.head))) { (acc, k) =>
        acc.when(col(s"d$k") === col("graft_min"), lit(k))
      }
      val assignedRaw = qv.select(col("qv") +: distCols: _*)
        .withColumn("graft_min", minDist)
        .select(col("qv"), bestK.as("k"), col("graft_min").as("dist"))
      val assigned =
        if (r < Rounds) graft.CacheScope.trackedCache(assignedRaw)
        else assignedRaw
      reports = reports :+ assigned.groupBy(col("k"))
        .agg(count(lit(1)).as("n_points"),
          sum(col("dist")).cast("long").as("inertia"))
        .select(lit(r.toLong).as("round"), col("k").as("cluster"),
          col("n_points"), col("inertia"))
      if (r < Rounds) {
        val dimSums = (1 to Dims).map(i =>
          sum(element_at(col("qv"), i)).cast("long").as(s"s$i"))
        val agg = assigned.groupBy(col("k"))
          .agg(count(lit(1)).cast("long").as("n"), dimSums: _*)
          .collect()
        centroids = agg.map { row =>
          val k = row.getLong(0)
          val n = row.getLong(1)
          k -> (1 to Dims).map(i => Math.floorDiv(row.getLong(1 + i), n))
            .toIndexedSeq
        }.toSeq.sortBy(_._1)
      }
    }
    reports.reduce(_ unionAll _)
      .withColumn("mean_dist",
        col("inertia").cast("double") / col("n_points").cast("double"))
      .orderBy(col("round"), col("cluster"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, sfDir)
    def vectors(): DataFrame = graft.queries.Ann.vectors(t)
    val shapes: Seq[(String, () => DataFrame)] = Seq(
      "A_fused" -> (() => shapeA(vectors())),
      "B_twopass" -> (() => shapeB(vectors())),
      "D_slimtwopass" -> (() => shapeD(vectors())))
    // correctness cross-check first (also the JIT warmup)
    val outs = shapes.map { case (n, f) =>
      val rows = f().collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      n -> rows
    }
    outs.tail.foreach { case (n, rows) =>
      require(rows == outs.head._2, s"$n output differs from ${outs.head._1}")
    }
    println(s"[kmeans-ab] all shapes agree (${outs.head._2.size} rows)")
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (rep <- 1 to reps; (n, f) <- shapes) {
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(s"$n rep$rep")
      val t0 = System.nanoTime()
      f().count()
      val sec = (System.nanoTime() - t0) / 1e9
      times(n) = times(n) :+ sec
      println(f"[kmeans-ab] $n rep=$rep sec=$sec%.3f")
    }
    shapes.foreach { case (n, _) =>
      val v = times(n).sorted
      println(f"[kmeans-ab] $n min=${v.head}%.3f med=${v(v.size / 2)}%.3f all=${times(n).map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
