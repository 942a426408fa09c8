package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Sessionize, SkewJoin, TopK}

/** Semantics of the standalone operators on tiny in-memory frames. */
class OperatorsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("Sessionize.byGap: session breaks exactly at gap > threshold") {
    import scala.jdk.CollectionConverters._
    val schema = "user LONG, ts TIMESTAMP, id LONG"
    val rows = Seq(
      Row(1L, ts("2024-01-01 00:00:00"), 1L),
      Row(1L, ts("2024-01-01 00:10:00"), 2L), // 10 min gap -> same session
      Row(1L, ts("2024-01-01 01:00:00"), 3L), // 50 min gap -> new session
      Row(2L, ts("2024-01-01 00:00:00"), 4L))
    val df = spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))
    val out = Sessionize.byGap(df, col("user"), col("ts"), col("id"), gapSeconds = 1800)
      .select("user", "id", "session_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }

  test("Sessionize.byGap: gap exactly at threshold stays in session") {
    import scala.jdk.CollectionConverters._
    val schema = "user LONG, ts TIMESTAMP, id LONG"
    val rows = Seq(
      Row(1L, ts("2024-01-01 00:00:00"), 1L),
      Row(1L, ts("2024-01-01 00:30:00"), 2L)) // exactly 1800s -> not > gap
    val df = spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))
    val seqs = Sessionize.byGap(df, col("user"), col("ts"), col("id"), gapSeconds = 1800)
      .select("session_seq").collect().map(_.getLong(0)).toSet
    assert(seqs == Set(1L))
  }

  test("TopK.perGroup: keeps exactly k rows per group in order") {
    import spark.implicits._
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "x")
    val out = TopK.perGroup(df, Seq(col("g")), Seq(col("x").desc), k = 2)
      .select("g", "x", "rn").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(("a", 3, 1L), ("a", 2, 2L), ("b", 9, 1L)))
  }

  test("SkewJoin.salted equals the unsalted join (same aggregate result)") {
    val t = tables
    val salted = SkewJoin.salted(
      t.lineitem, t.orders.select(col("o_orderkey"), col("o_orderpriority")),
      "l_orderkey", "o_orderkey", Seq(col("l_orderkey"), col("l_linenumber")), numSalts = 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().toSeq
    val plain = t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(salted == plain)
  }

  test("approx_percentile tracks exact percentiles (q10b bound)") {
    val approx = run("q10b_approx_percentile").collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val exact = run("q10_percentile").collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, ap) <- approx; (a, e) <- ap.zip(exact(flag))) {
      // accuracy=10000 on sf0.001 groups (~thousands of rows) ⇒ the
      // sketch returns an actual element within tiny rank error of the
      // true percentile; allow 5% relative slack for the interpolation
      // difference (exact percentile_cont interpolates, the sketch
      // returns an observed value).
      assert(math.abs(a - e) <= math.max(0.05 * math.abs(e), 1.0),
        s"$flag: approx percentile $a vs exact $e")
    }
  }

  test("approx_count_distinct is within 10% of exact (q25 bound)") {
    val t = tables
    val rows = t.orders.groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey")).as("a"),
        countDistinct(col("o_custkey")).as("e"))
      .collect()
    for (r <- rows) {
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      // HLL++ default rsd is 5%; small sf0.001 groups can sit right at
      // the boundary, so the regression bound is 2x the rsd.
      assert(math.abs(a - e) / e < 0.10, s"approx $a vs exact $e off by >10%")
    }
  }
}
