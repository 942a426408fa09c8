package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{Components, Dedup => D}

/** Scratch profiler for the q45 connected-components loop (round 5):
  * prints per-stage wall times and round count at a given SF.
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val t = Tables(spark, sfDir)
    val pairs = timed("nearDupPairs materialize") {
      val p = D.nearDupPairs(t.documents, "doc_id", "text")
        .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
      println(s"[ccprobe] pairs = ${p.count()}")
      p
    }
    val (labels, rounds) = timed("labelWithStats") {
      Components.labelWithStats(pairs, "doc_a", "doc_b")
    }
    println(s"[ccprobe] rounds = $rounds, labeled nodes = ${labels.count()}")
    spark.stop()
  }
}
