package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.Packing

/** q220 window packing / q221 serpentine shard balance: hand-computed
  * streams, conservation invariants, and the balance bound.
  */
class PackingSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docs(rows: Seq[(Long, String, String)]) =
    spark.createDataFrame(
      rows.map { case (id, src, text) => Row(id, src, text) }.asJava,
      StructType.fromDDL("doc_id BIGINT, source STRING, text STRING"))

  private def word(n: Int) = Seq.fill(n)("w").mkString(" ")

  test("q220 hand stream: window attribution and straddlers at B = 10") {
    // one source, token counts 4, 4, 4, 7, 2 -> cum 4 8 12 19 21:
    //  doc 1 starts at 0  -> window 0, ends 3  -> no straddle
    //  doc 2 starts at 4  -> window 0, ends 7  -> no straddle
    //  doc 3 starts at 8  -> window 0, ends 11 -> STRADDLES into w1
    //  doc 4 starts at 12 -> window 1, ends 18 -> no straddle
    //  doc 5 starts at 19 -> window 1, ends 20 -> STRADDLES into w2
    val d = docs(Seq(
      (1L, "s", word(4)), (2L, "s", word(4)), (3L, "s", word(4)),
      (4L, "s", word(7)), (5L, "s", word(2))))
    val out = Packing.pack(d, b = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      ("s", 0L) -> ((3L, 12L, 1L)),
      ("s", 1L) -> ((2L, 9L, 1L))))
  }

  test("q220 conserves tokens and packs sources independently") {
    val out = run("q220_sequence_packing")
    val perSource = out.groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("window_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = tables.documents
      .selectExpr("source",
        "size(split(trim(text), '\\\\s+')) AS tok")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource == want, "window_tokens do not conserve per-source totals")
  }

  test("q221 serpentine deal: block 0 left-to-right, block 1 right-to-left") {
    // sizes 16,15,...,1 over K=4: ranks 0..15.
    // block 0 (ranks 0-3)  -> shards 0,1,2,3 get sizes 16,15,14,13
    // block 1 (ranks 4-7)  -> shards 3,2,1,0 get sizes 12,11,10,9
    // block 2 (ranks 8-11) -> shards 0,1,2,3 get sizes 8,7,6,5
    // block 3 (ranks 12-15)-> shards 3,2,1,0 get sizes 4,3,2,1
    // shard totals: 0: 16+9+8+1=34, 1: 15+10+7+2=34,
    //               2: 14+11+6+3=34, 3: 13+12+5+4=34 — perfectly flat
    val d = docs((1 to 16).map(i => (i.toLong, "s", word(17 - i))))
    val out = CacheScope.withCacheScope {
      Packing.deal(d, k = 4).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    assert(out == Map(0L -> ((4L, 34L)), 1L -> ((4L, 34L)),
      2L -> ((4L, 34L)), 3L -> ((4L, 34L))))
  }

  test("q221 balance bound on planted skew: max/min share stays tight") {
    // one giant doc + many small: serpentine cannot beat the giant,
    // but every NON-giant shard must be within one max-item of the
    // giant-free mean (the standard sorted-deal bound)
    val d = docs((1 to 33).map(i =>
      (i.toLong, "s", word(if (i == 1) 100 else 10))))
    val out = CacheScope.withCacheScope {
      Packing.deal(d, k = 4).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    assert(out.values.sum == 100L + 32L * 10L)
    val nonGiant = out.values.filter(_ < 100L)
    assert(nonGiant.max - nonGiant.min <= 10L,
      s"non-giant shards diverge by more than one item: $out")
  }
}
