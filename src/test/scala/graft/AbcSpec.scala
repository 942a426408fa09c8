package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.Abc

/** q182 ABC classification: whale-takes-A, the first-crossing
  * straddle rule at an exact 70% landing, the uniform case, and
  * mass conservation across classes.
  */
class AbcSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def run(masses: Seq[(Long, Long)]) = {
    val df = spark.createDataFrame(
      masses.map { case (k, v) => Row(k, v) }.asJava,
      StructType.fromDDL("k LONG, rev LONG"))
    Abc.classify(df, "k", "rev")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("q182 whale takes A alone; straddler of 90% lands in B") {
    // total 100: whale 69 starts at 0 (<70) -> A; next 25 starts at
    // 69 (<70!) -> A too (first-crossing rule); 6 starts at 94 -> C
    val out = run(Seq((1L, 69L), (2L, 25L), (3L, 6L)))
    assert(out("A") == ((2L, 94L, 0.94)))
    assert(out("C") == ((1L, 6L, 0.06)))
    assert(!out.contains("B"))
  }

  test("q182 exact 70% landing: next part starts AT the threshold, not below") {
    // total 100: 70 starts at 0 -> A; 20 starts at 70, (70)*10 = 700
    // NOT < 700 -> B; 10 starts at 90 -> C
    val out = run(Seq((1L, 70L), (2L, 20L), (3L, 10L)))
    assert(out("A") == ((1L, 70L, 0.70)))
    assert(out("B") == ((1L, 20L, 0.20)))
    assert(out("C") == ((1L, 10L, 0.10)))
  }

  test("q182 uniform masses split 7/2/1 at the 70/90 cuts") {
    // 10 keys x 10: starts 0,10,...,90 -> A for starts < 70 (7 keys),
    // B for 70,80 (2 keys), C for 90 (1 key)
    val out = run((1L to 10L).map(k => (k, 10L)))
    assert(out("A")._1 == 7L && out("B")._1 == 2L && out("C")._1 == 1L)
    assert(out("A")._2 + out("B")._2 + out("C")._2 == 100L)
  }

  test("q182 revenue ties break by key: deterministic class boundary") {
    // two equal masses straddling the cut: order (rev desc, key asc)
    // total 10: key1=5 starts 0 -> A, key2=5 starts 5, 50 < 70 -> A
    val out = run(Seq((2L, 5L), (1L, 5L)))
    assert(out("A")._1 == 2L)
  }

  test("q182 shares sum to 1 on a fixed random distribution") {
    val rnd = new scala.util.Random(182182L)
    val masses = (1L to 200L).map(k => (k, rnd.nextInt(1000).toLong + 1))
    val out = run(masses)
    val total = masses.map(_._2).sum
    assert(out.values.map(_._2).sum == total)
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-12)
  }
}
