package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{QuantFidelity, TripletMargin}

/** q255 triplet-margin audit and q256 quantization fidelity: planted
  * label structures and exactly-representable vectors. (The oracle
  * gate proves DuckDB-replayability — including q256's SQL emulation
  * of the production quantizer's Math.rint — these pin semantics.)
  */
class EmbedAuditSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def emb(rows: Seq[(Long, Int, Seq[Double])]) =
    spark.createDataFrame(
      rows.map { case (id, l, v) => Row(id, l, v) }.asJava,
      StructType.fromDDL("vec_id BIGINT, label INT, v ARRAY<DOUBLE>"))

  test("q255 clean clusters give positive margins and zero violations") {
    // query 0 (label 1) with a near-identical positive and an
    // orthogonal negative: margin ≈ 1, no negative above the positive
    val out = TripletMargin.margins(emb(Seq(
      (0L, 1, Seq(1.0, 0.0, 0.0)),
      (1L, 1, Seq(1.0, 0.001, 0.0)),
      (2L, 2, Seq(0.0, 1.0, 0.0))))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 0L && r.getInt(1) == 1)
    assert(r.getDouble(2) == 1.0, s"hardest positive ~1: ${r.getDouble(2)}")
    assert(r.getDouble(4) > 0.99, s"margin ~1: ${r.getDouble(4)}")
    assert(r.getLong(5) == 0L, "no violations in a clean cluster")
  }

  test("q255 a planted label error flips the margin negative and counts the violation") {
    // the negative (label 2) is CLOSER to the query than its positive
    val out = TripletMargin.margins(emb(Seq(
      (0L, 1, Seq(1.0, 0.0, 0.0)),
      (1L, 1, Seq(0.0, 1.0, 0.0)),      // far positive
      (2L, 2, Seq(1.0, 0.0001, 0.0))))) // near negative — a label error
      .collect()
    val r = out.head
    assert(r.getDouble(4) < 0, s"margin must be negative: ${r.getDouble(4)}")
    assert(r.getLong(5) == 1L, "the hard negative must be counted")
  }

  test("q255 a query with no same-label peer reports NULL margin and NULL violations") {
    val out = TripletMargin.margins(emb(Seq(
      (0L, 1, Seq(1.0, 0.0, 0.0)),
      (2L, 2, Seq(0.0, 1.0, 0.0))))).collect()
    val r = out.head
    assert(r.isNullAt(2) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("q256 an exactly-representable vector quantizes with fidelity 1") {
    // ±1 elements: s = 127, every x·s = ±127 exactly — the int8 image
    // is exactly parallel to the original, zero rounding error
    val v = (1 to 64).map(d => if (d % 2 == 0) 1.0 else -1.0)
    val out = QuantFidelity.fidelity(emb(Seq((0L, 1, v)))).collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 1.0,
      s"exact lattice vector must round-trip: ${out.head.getDouble(2)}")
  }

  test("q256 the zero vector guards to NULL and drops out of the mean") {
    val out = QuantFidelity.fidelity(emb(Seq(
      (0L, 1, Seq.fill(8)(0.0)),
      (1L, 1, Seq(1.0, 0.5, 0.25, 0.125, 0.0, 0.0, 0.0, 0.0)))))
      .collect()
    val r = out.head
    assert(r.getLong(1) == 2L, "both vectors counted")
    assert(!r.isNullAt(2), "the nonzero vector still yields a mean")
    assert(r.getDouble(2) > 0.99, s"near-lattice vector fidelity: ${r.getDouble(2)}")
  }

  test("q256 real-corpus fidelity is high everywhere (the int8 tier is safe)") {
    val rows = run("q256_quant_fidelity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.99,
        s"label ${r.get(0)} min fidelity ${r.getDouble(3)} — int8 unsafe?")
    }
  }
}
