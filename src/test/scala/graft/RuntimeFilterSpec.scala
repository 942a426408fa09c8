package graft

import org.apache.spark.sql.functions._

/** Runtime row-level filtering (Catalyst's runtime Bloom-filter join
  * pruning) — the engine-level scale feature behind selective
  * fact⋈fact joins at 100 TB: when one join side is filtered hard,
  * Spark injects a Bloom filter built from the selective side into
  * the big side's scan, so most big-side rows die BEFORE the shuffle
  * instead of after it. Production defaults gate the rewrite on
  * multi-GB scan sizes, so this spec scopes the thresholds down to
  * the test corpus; the assertions are (a) the rewrite actually
  * fires (might_contain in the big side's plan) and (b) the result
  * is bit-identical with the optimization off — correctness never
  * depends on the filter (it only prunes rows the join would drop).
  */
class RuntimeFilterSpec extends SparkSpec {

  private def selectiveJoin() = {
    val t = tables
    // hard-filtered orders slice joined against the lineitem fact
    val sel = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"))
    t.lineitem.select(col("l_orderkey"), col("l_quantity"))
      .join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy()
      .agg(count(lit(1)).as("n"),
        graft.functions.det.dsum(col("l_quantity")).as("qty"))
  }

  private def withRuntimeBloom[T](on: Boolean)(f: => T): T =
    withConf("spark.sql.optimizer.runtime.bloomFilter.enabled", on.toString) {
      withConf("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB") {
        withConf("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0") {
          // keep the injected subquery from being planned away as a
          // broadcast-join reuse — force the shuffle-join regime the
          // optimization exists for
          withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
            withConf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")(f)
          }
        }
      }
    }

  test("runtime Bloom filter injects into the fact side of a selective join") {
    val (plan, rows) = withRuntimeBloom(on = true) {
      val df = selectiveJoin()
      (planOf(df), df.collect())
    }
    assert(plan.contains("might_contain"),
      s"runtime bloom filter did not fire:\n$plan")
    val rowsOff = withRuntimeBloom(on = false)(selectiveJoin().collect())
    assert(rows.toSeq == rowsOff.toSeq,
      "runtime filtering must not change the result")
    assert(rows(0).getAs[Long]("n") > 0L)
  }
}
