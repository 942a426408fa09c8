package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{HillTail, Neyman, Power}

/** q242 MDE/power, q243 Neyman allocation, q244 Hill tail index:
  * closed-form fixtures for the planning tier.
  */
class PlanningSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.functions._

  private def custOrders(rows: Seq[(Long, String, Double)]) = {
    val cust = spark.createDataFrame(
      rows.map { case (id, seg, _) => Row(id, seg) }.asJava,
      StructType.fromDDL("c_custkey BIGINT, c_mktsegment STRING"))
    val orders = spark.createDataFrame(
      rows.map { case (id, _, y) => Row(id, y) }.asJava,
      StructType.fromDDL("o_custkey BIGINT, o_totalprice DOUBLE"))
    (cust, orders)
  }

  test("q242 MDE scales as 1/sqrt(n): 4x the units halves the detectable effect") {
    // segment A: 8 units alternating 90/110; segment B: 32 units,
    // same alternating values -> identical variance, 4x the n.
    val a = (1 to 8).map(i => (i.toLong, "A", if (i % 2 == 0) 110.0 else 90.0))
    val b = (101 to 132).map(i => (i.toLong, "B", if (i % 2 == 0) 110.0 else 90.0))
    val (c, o) = custOrders(a ++ b)
    val out = Power.plan(c, o).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("A")._2 == 100.0 && out("B")._2 == 100.0)
    // MDE ∝ sqrt(var/n): normalize away the n/(n-1) sample-var gap
    val ratio = (out("A")._4 / out("B")._4) /
      math.sqrt(out("A")._3 / out("B")._3)
    assert(math.abs(ratio - 2.0) < 1e-12, s"normalized MDE ratio should be 2, got $ratio")
  }

  test("q242 n_per_arm matches the closed form on a hand variance") {
    // values 90/110 -> var = n/(n-1) * 100 with mean 100;
    // for n=8: var = 800/7. n_per_arm(1%) = ceil(2*var*z^2/(1)^2)
    val (c, o) = custOrders((1 to 8).map(i =>
      (i.toLong, "A", if (i % 2 == 0) 110.0 else 90.0)))
    val r = Power.plan(c, o).collect().head
    val varY = r.getDouble(3)
    assert(math.abs(varY - 800.0 / 7.0) < 1e-9)
    val z2 = (1.96 + 0.8416) * (1.96 + 0.8416)
    assert(r.getLong(6) == math.ceil(2.0 * varY * z2 / 1.0).toLong)
  }

  test("q243 allocations conserve the budget exactly and sigma tilts seats") {
    // HIGH-variance segment same size as LOW-variance one: Neyman
    // must give HIGH strictly more than proportional does.
    val hi = (1 to 40).map(i => (i.toLong, "HI", if (i % 2 == 0) 200.0 else 0.0))
    val lo = (101 to 140).map(i => (i.toLong, "LO", if (i % 2 == 0) 101.0 else 99.0))
    val (c, o) = custOrders(hi ++ lo)
    val cust = c.join(o, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment").as("seg"))
      .agg(sum(col("o_totalprice").cast(graft.functions.det.D20_6)).as("y"))
    val out = Neyman.allocate(cust, 100L).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.values.map(_._1).sum == 100L, s"neyman must sum to budget: $out")
    assert(out.values.map(_._2).sum == 100L, s"proportional must sum to budget: $out")
    assert(out("HI")._2 == 50L && out("LO")._2 == 50L)
    assert(out("HI")._1 > 90L, s"sigma tilt: $out")
  }

  test("q244 recovers the planted tail index on an exact log-linear spectrum") {
    // counts x_i = 2^((kth - i) * 2) for i = 1..kth-1, x_kth = 1:
    // log2(x_i/x_kth) = 2*(kth - i); with kth = 9, sum over i<9 =
    // 2*(8+7+...+1) = 72 -> alpha = 8 / (72 * ln 2)
    val tc = spark.createDataFrame(
      ((1 to 9).map { i =>
        Row("s", s"t$i", math.pow(2.0, (9 - i) * 2).toLong)
      }).asJava,
      StructType.fromDDL("source STRING, term STRING, c BIGINT"))
    val r = HillTail.hillOnCounts(tc).collect().head
    assert(r.getLong(1) == 8L)
    val want = 8.0 / (72.0 * 0.6931471805599453)
    assert(math.abs(r.getDouble(2) - want) < 1e-9, s"got ${r.getDouble(2)} want $want")
  }

  test("q244 drops sources with vocab < 3 and adapts kth to small vocabularies") {
    val tc = spark.createDataFrame(
      Seq(Row("tiny", "a", 5L), Row("tiny", "b", 3L),
        Row("sm", "a", 8L), Row("sm", "b", 4L), Row("sm", "c", 2L),
        Row("sm", "d", 1L)).asJava,
      StructType.fromDDL("source STRING, term STRING, c BIGINT"))
    val out = HillTail.hillOnCounts(tc).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("tiny"))
    assert(out("sm") == 3L, s"kth = vocab = 4 -> k_used 3, got $out")
  }
}
