package graft

/** Plan-shape assertions for the relational core — the properties that
  * make the queries scale-safe (SURVEY.md §5), asserted on the actual
  * executed plans: filters/projections reach the parquet scan,
  * dimension joins broadcast, window top-k gets partial
  * WindowGroupLimit, two-phase aggregation is present.
  */
class RelationalSpec extends SparkSpec {

  test("q01: filter and projection are pushed into the parquet scan") {
    val p = planOf(run("q01_agg_pushdown"))
    assert(p.contains("PushedFilters:"), "no pushed filters in scan")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"shipdate filter not pushed")
    assert(!p.contains("l_tax"), "ReadSchema not pruned: l_tax still read")
    assert(p.contains("HashAggregate"), "no hash aggregate")
  }

  test("q02: both dimension joins are broadcast, fact side never shuffles pre-agg") {
    val p = planOf(run("q02_join_broadcast"))
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).size
    assert(nBroadcast >= 2, s"expected >=2 BroadcastHashJoin, plan:\n$p")
    assert(!p.contains("SortMergeJoin"), "dim join degraded to SortMergeJoin")
  }

  test("q03: orders date filter is pushed to the scan") {
    val p = planOf(run("q03_multi_join_agg"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), "orderdate filter not pushed")
  }

  test("q05/q08: window top-k gets WindowGroupLimit (partial top-k before shuffle)") {
    assert(planOf(run("q05_window_rank")).contains("WindowGroupLimit"))
    assert(planOf(run("q08_topk_per_group")).contains("WindowGroupLimit"))
  }

  test("q27: aggregation is two-phase (partial before the exchange)") {
    val p = planOf(run("q27_bucketed_groupby"))
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"no partial aggregate phase in plan:\n$p")
  }

  test("q30: text pipeline stays in WholeStageCodegen (no UDFs)") {
    val df = run("q30_token_count")
    df.collect() // finalize the AQE plan so codegen stages are visible
    val p = df.queryExecution.executedPlan.toString()
    // codegen stages print as "*(n) Operator" in the plan tree
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined,
      s"text projection fell out of codegen:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), "UDF in hot path")
  }

  test("every registered query returns rows on sf0.001") {
    for (q <- Registry.all) {
      val n = q.run(spark, sfDir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
