package graft.tools

import graft.{GraftSession, Registry, SparkEntry}

/** Plan-audit CLI: `runMain graft.tools.Explain <sfDir> [query ...]`.
  * Prints the formatted physical plan per query (SURVEY.md §5: verify
  * PushedFilters / pruned ReadSchema / broadcast / no extra shuffles).
  * With no query args, prints entry() row count + all plans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Registry.all.map(_.name)
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    println(s"ENTRY_ROWS=${SparkEntry.entry(spark).count()}")
    names.foreach { n =>
      println(s"\n===== $n =====")
      Registry.byName(n).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
