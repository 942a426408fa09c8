package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{DupPosition, EntropyRate, JsdMatrix}

/** q245 entropy rate, q246 JSD matrix, q247 duplication position:
  * information-theoretic closed forms and planted-position fixtures.
  */
class SequenceInfoSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.functions._

  private def events(rows: Seq[(Long, Long, Long, String)]) =
    spark.createDataFrame(
      rows.map { case (id, u, us, ty) => Row(id, u, us, ty) }.asJava,
      StructType.fromDDL(
        "event_id BIGINT, user_id BIGINT, us BIGINT, event_type STRING"))
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")

  test("q245 deterministic chain has zero entropy; a fair coin has exactly 1 bit") {
    // user 1: a->b->a->b... deterministic transitions
    val det = (0 until 9).map(i =>
      ((i + 1).toLong, 1L, (i * 10).toLong, if (i % 2 == 0) "a" else "b"))
    val out = EntropyRate.rate(events(det)).collect()
    out.foreach { r =>
      assert(r.getDouble(2) == 0.0, s"deterministic state must carry 0 bits: $r")
      assert(r.getDouble(3) == 0.0)
    }
    // fair coin: from state a, successors a and b equally often
    val coin = events(Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 10L, "a"), (3L, 1L, 20L, "b"),
      (4L, 2L, 0L, "a"), (5L, 2L, 10L, "b"), (6L, 2L, 20L, "a"),
      (7L, 3L, 0L, "a"), (8L, 3L, 10L, "a"),
      (9L, 4L, 0L, "a"), (10L, 4L, 10L, "b")))
    // transitions: a->a x2, a->b x3, b->a x1 -> state a: p=(2/5,3/5),
    // state b: deterministic
    val m = EntropyRate.rate(coin).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m("b")._2 == 0.0)
    val expA = -(2.0 / 5.0 * (math.log(2.0 / 5.0) / math.log(2.0))
      + 3.0 / 5.0 * (math.log(3.0 / 5.0) / math.log(2.0)))
    assert(math.abs(m("a")._2 - expA) < 2e-6, s"got ${m("a")._2} want $expA")
  }

  private def docs(rows: Seq[(Long, String, String)]) =
    spark.createDataFrame(
      rows.map { case (id, src, text) => Row(id, src, text) }.asJava,
      StructType.fromDDL("doc_id BIGINT, source STRING, text STRING"))

  test("q246 identical sources diverge by 0; disjoint vocabularies by exactly 1 bit") {
    val d = docs(Seq(
      (1L, "A", "x y z x"), (2L, "B", "x y z x"),
      (3L, "C", "p q r s")))
    val out = JsdMatrix.matrix(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(out(("A", "B"))) < 2e-6, s"identical must be ~0: $out")
    assert(out(("A", "C")) == 1.0, s"disjoint must be exactly 1 bit: $out")
    assert(out(("B", "C")) == 1.0)
  }

  test("q246 hand half-overlap matches the closed form") {
    // P uniform on {x}, Q uniform on {x, y}: p_x=1, q_x=q_y=1/2
    // JSD = 1/2*[1*log2(2/(3/2)) + 1/2*log2(1/(3/2))] + 1/2*(1/2*1)
    val d = docs(Seq((1L, "P", "x x"), (2L, "Q", "x y")))
    val got = JsdMatrix.matrix(d).collect().head.getDouble(3)
    def lg(v: Double) = math.log(v) / math.log(2.0)
    val shared = 1.0 * lg(2.0 / 1.5) + 0.5 * lg(1.0 / 1.5)
    val want = 0.5 * (shared + (1.0 - 1.0) + (1.0 - 0.5))
    assert(math.abs(got - want) < 2e-6, s"got $got want $want")
  }

  test("q247 planted header/footer duplication lands in the right thirds") {
    // 24-token docs sharing an 8-token HEADER; 24-token docs sharing
    // an 8-token FOOTER. Header grams start at pos 0 (third 0);
    // footer grams start at pos 16 (third 2).
    val header = (1 to 8).map(i => s"h$i").mkString(" ")
    val footer = (1 to 8).map(i => s"f$i").mkString(" ")
    def uniq(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val d = docs(Seq(
      (1L, "HEAD", header + " " + uniq("a", 16)),
      (2L, "HEAD", header + " " + uniq("b", 16)),
      (3L, "FOOT", uniq("c", 16) + " " + footer),
      (4L, "FOOT", uniq("d", 16) + " " + footer)))
    val out = DupPosition.profile(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("HEAD") == ((2L, 0L, 0L)), s"got $out")
    assert(out("FOOT") == ((0L, 0L, 2L)), s"got $out")
  }
}
