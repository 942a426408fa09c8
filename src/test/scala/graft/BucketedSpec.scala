package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan pins for q81 — the registry consumer of the bucketed-table
  * layout. Correctness is oracle-gated like any entry; this spec pins
  * the SHAPE: the fact⋈fact join and the per-key aggregate must ride
  * the bucket layout with zero exchanges, under disabled auto-broadcast
  * so the sf0.001 plan takes the same sort-merge form a 100-TB run
  * would (a broadcast join would hide a missing co-location).
  */
class BucketedSpec extends SparkSpec {

  test("q81: fact⋈fact join + aggregate ride the bucket layout with zero exchanges") {
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      withConf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1") {
        val df = run("q81_bucketed_join")
        df.count() // finalize the adaptive plan before walking it
        val ex = physicalNodes(df).collect { case s: ShuffleExchangeExec => s }
        assert(ex.isEmpty,
          s"q81 read-side plan has ${ex.size} exchange(s) — the bucketed " +
            s"layout should eliminate all of them:\n${planOf(df)}")
        assert(broadcasts(df).isEmpty,
          s"q81 joined via broadcast under disabled auto-broadcast:\n${planOf(df)}")
      }
    }
  }

  test("q81: result matches the plain (non-bucketed) plan") {
    import org.apache.spark.sql.functions._
    import graft.functions.det.dsum
    val t = tables
    val plain = t.lineitem
      .join(t.orders.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    val got = run("q81_bucketed_join")
    assert(got.count() == plain.count(), "row count diverged from the plain plan")
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty,
      "bucketed plan changed the query result")
  }
}
