package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Interpreted-expression audit (VERDICT r13 #7): for every registry
  * query, walk the physical plan — descending into AQE wrappers and
  * each distinct cached relation — and report every expression that
  * is a CodegenFallback (evaluated interpreted, never fused into a
  * WholeStageCodegen span). Prints one line per (query, plan-node,
  * expression-class) with a count, so hot filters/projections that
  * silently fall back are visible. Usage:
  *   runMain graft.tools.CodegenAudit <sfDir> [query ...]
  */
object CodegenAudit {

  private def walk(root: SparkPlan): Seq[SparkPlan] = {
    val seen = scala.collection.mutable.Set[Int]()
    def go(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case m: InMemoryTableScanExec
            if seen.add(System.identityHashCode(m.relation.cacheBuilder)) =>
          Seq(m.relation.cachedPlan)
        case other => other.children
      }
      p +: kids.flatMap(go)
    }
    go(root)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.Registry.all.map(_.name)
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val df: DataFrame = graft.Registry.byName(n).run(spark, sfDir)
        val hits = scala.collection.mutable.Map[(String, String), Int]()
          .withDefaultValue(0)
        walk(df.queryExecution.executedPlan).foreach { node =>
          node.expressions.foreach { e =>
            e.foreach {
              case f: CodegenFallback =>
                hits((node.getClass.getSimpleName,
                  f.getClass.getSimpleName)) += 1
              case _ => ()
            }
          }
        }
        if (hits.isEmpty) println(s"AUDIT $n clean")
        else hits.toSeq.sorted.foreach { case ((node, expr), c) =>
          println(s"AUDIT $n $node $expr x$c")
        }
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"AUDIT $n ERROR ${e.getClass.getSimpleName}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
