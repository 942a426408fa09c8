package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.{IvmJoin, SnapshotDiff, Tfidf}

/** q193 TF-IDF cosine / q194 snapshot diff / q195 join-view IVM:
  * hand-computed cosines and ledgers, blocking and df-cap cutoffs,
  * and merge ≡ recompute differentials.
  */
class DiffMaintSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // ---- q193 TF-IDF ----

  private def termsOf(rows: Seq[(Long, String, String, String, Long)]) =
    spark.createDataFrame(
      rows.map { case (d, l, s, t, tf) => Row(d, l, s, t, tf) }.asJava,
      StructType.fromDDL(
        "doc_id BIGINT, lang STRING, source STRING, term STRING, tf BIGINT"))

  test("q193 hand-computed cosine within one block") {
    // N = 100 ⇒ idf = log2(100/df); d1,d2 identical {A:1,B:1}; d3 {B:2}
    val terms = termsOf(Seq(
      (1L, "en", "s", "A", 1L), (1L, "en", "s", "B", 1L),
      (2L, "en", "s", "A", 1L), (2L, "en", "s", "B", 1L),
      (3L, "en", "s", "B", 2L)))
    val out = Tfidf.topkCosine(terms, 100L).orderBy(col("doc_id"), col("rk"))
      .collect()
    val top1 = out.find(r => r.getAs[Long]("doc_id") == 1L &&
      r.getAs[Int]("rk") == 1).get
    assert(top1.getAs[Long]("partner") == 2L)
    assert(top1.getAs[Double]("cosine") > 0.999999)
    // cos(d1, d3) = wB / sqrt(wA² + wB²), wA = log2(50), wB = log2(100/3)
    val wA = math.log(50.0) / math.log(2.0)
    val wB = math.log(100.0 / 3.0) / math.log(2.0)
    val expected = wB / math.sqrt(wA * wA + wB * wB)
    val d13 = out.find(r => r.getAs[Long]("doc_id") == 1L &&
      r.getAs[Int]("rk") == 2).get
    assert(d13.getAs[Long]("partner") == 3L)
    assert(math.abs(d13.getAs[Double]("cosine") - expected) < 1e-4)
  }

  test("q193 blocking: identical docs in different blocks never pair") {
    val terms = termsOf(Seq(
      (1L, "en", "s1", "A", 1L),
      (2L, "en", "s2", "A", 1L)))
    assert(Tfidf.topkCosine(terms, 100L).count() == 0L)
  }

  test("q193 df cap prunes stop-bigrams: df·4 > N terms contribute nothing") {
    // N = 8, A has df 3 (3·4 > 8 ⇒ dropped); only B (df 2) links d1,d2
    val terms = termsOf(Seq(
      (1L, "en", "s", "A", 1L), (2L, "en", "s", "A", 1L),
      (3L, "en", "s", "A", 1L),
      (1L, "en", "s", "B", 1L), (2L, "en", "s", "B", 1L)))
    val out = Tfidf.topkCosine(terms, 8L).collect()
    assert(out.forall(r => Set(1L, 2L)(r.getAs[Long]("doc_id"))))
    assert(out.forall(_.getAs[Double]("cosine") > 0.999999))
  }

  // ---- q194 snapshot diff ----

  private def snap(rows: Seq[(Long, Double, String)]) =
    spark.createDataFrame(
      rows.map { case (k, p, s) => Row(k, p, s) }.asJava,
      StructType.fromDDL("key BIGINT, price DOUBLE, status STRING"))

  test("q194 every disposition lands in the right ledger cell") {
    val a = snap(Seq((1L, 10.0, "A"), (2L, 10.0, "B"), (3L, 10.0, "C")))
    val b = snap(Seq((2L, 11.0, "B"), (3L, 10.0, "C2"), (4L, 5.0, "D")))
    val out = SnapshotDiff.diffLedger(a, b).orderBy(col("disposition"))
      .collect().map(r => r.getAs[String]("disposition") -> r).toMap
    assert(out("removed").getAs[Long]("n") == 1L &&
      out("removed").getAs[Long]("min_key") == 1L)
    assert(out("added").getAs[Long]("n") == 1L &&
      out("added").getAs[Long]("max_key") == 4L)
    val c = out("common")
    assert(c.getAs[Long]("n") == 2L)
    assert(c.getAs[Long]("price_changed") == 1L)
    assert(c.getAs[Long]("status_changed") == 1L)
    assert(c.getAs[Long]("any_changed") == 2L)
  }

  test("q194 identical snapshots report all-common, zero changes") {
    val a = snap(Seq((1L, 10.0, "A"), (2L, 20.0, "B")))
    val out = SnapshotDiff.diffLedger(a, a).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("disposition") == "common")
    assert(out(0).getAs[Long]("any_changed") == 0L)
  }

  test("q194 NULL-vs-NULL column values compare equal (null-safe)") {
    val a = snap(Seq((1L, 10.0, "A"))).withColumn("status",
      lit(null).cast("string"))
    val out = SnapshotDiff.diffLedger(a, a).collect()
    assert(out(0).getAs[Long]("status_changed") == 0L)
  }

  // ---- q195 join-view IVM ----

  private def ordersOf(rows: Seq[(Long, Long)]) =
    spark.createDataFrame(rows.map { case (o, c) => Row(o, c) }.asJava,
      StructType.fromDDL("o_orderkey BIGINT, o_custkey BIGINT"))

  private def linesOf(rows: Seq[(Long, Double, Double, String)]) =
    spark.createDataFrame(
      rows.map { case (o, p, d, ts) =>
        Row(o, p, d, java.sql.Timestamp.valueOf(ts + " 00:00:00")) }.asJava,
      StructType.fromDDL("l_orderkey BIGINT, l_extendedprice DOUBLE, " +
        "l_discount DOUBLE, l_shipdate TIMESTAMP"))

  test("q195 merge of base ⊕ delta equals the full recompute, " +
    "including straddling orders and delta-only customers") {
    val orders = ordersOf(Seq((10L, 1L), (11L, 1L), (12L, 2L)))
    val base = linesOf(Seq(
      (10L, 100.0, 0.1, "1997-01-01"),
      (11L, 50.0, 0.0, "1997-02-01")))
    val delta = linesOf(Seq(
      (10L, 30.0, 0.2, "1997-07-01"),   // order 10 straddles the split
      (12L, 80.0, 0.05, "1997-08-01"))) // customer 2 only in the delta
    val merged = IvmJoin.mergeViews(
      IvmJoin.viewOf(orders, base), IvmJoin.viewOf(orders, delta))
      .orderBy(col("cust")).collect()
    val full = IvmJoin.viewOf(orders, base.union(delta))
      .orderBy(col("cust")).collect()
    assert(merged.length == full.length)
    merged.zip(full).foreach { case (m, f) =>
      assert(m.getAs[Long]("cust") == f.getAs[Long]("cust"))
      assert(m.getAs[java.math.BigDecimal]("graft_rev")
        .compareTo(f.getAs[java.math.BigDecimal]("graft_rev")) == 0)
      assert(m.getAs[Long]("n_items") == f.getAs[Long]("n_items"))
      assert(m.getAs[java.sql.Timestamp]("first_ship") ==
        f.getAs[java.sql.Timestamp]("first_ship"))
      assert(m.getAs[java.sql.Timestamp]("last_ship") ==
        f.getAs[java.sql.Timestamp]("last_ship"))
    }
  }

  test("q195 merge with an empty delta is the identity") {
    val orders = ordersOf(Seq((10L, 1L)))
    val base = linesOf(Seq((10L, 100.0, 0.1, "1997-01-01")))
    val empty = linesOf(Seq())
    val merged = IvmJoin.mergeViews(
      IvmJoin.viewOf(orders, base), IvmJoin.viewOf(orders, empty)).collect()
    assert(merged.length == 1)
    assert(merged(0).getAs[Long]("n_items") == 1L)
    assert(merged(0).getAs[java.math.BigDecimal]("graft_rev")
      .doubleValue() == 90.0)
  }
}
