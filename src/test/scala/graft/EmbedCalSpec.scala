package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{EmbedStats, MinhashCal}

/** q237 embedding variance decomposition and q238 minhash
  * calibration: closed-form clusters and planted-duplicate pairing.
  */
class EmbedCalSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def vecs(rows: Seq[(Int, Seq[Double])]) =
    spark.createDataFrame(
      rows.map { case (l, v) => Row(l, v) }.asJava,
      StructType.fromDDL("label INT, v ARRAY<DOUBLE>"))

  test("q237 identical vectors have zero variance; a symmetric pair has zero centroid") {
    val out = EmbedStats.decompose(vecs(Seq(
      (1, Seq(3.0, 4.0)), (1, Seq(3.0, 4.0)),
      (2, Seq(1.0, -1.0)), (2, Seq(-1.0, 1.0))))).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // label 1: every vector is (3,4): avg_norm2 = 25, centroid (3,4),
    // centroid_norm2 = 25, variance 0
    assert(out(1) == ((2L, 25.0, 25.0, 0.0)))
    // label 2: mirror pair: centroid (0,0), avg_norm2 = 2, var = 2
    assert(out(2) == ((2L, 2.0, 0.0, 2.0)))
  }

  test("q237 law of total variance holds on the real table (within quantization)") {
    val rows = run("q237_embed_variance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (avg, cn, v) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(v == avg - cn)
      assert(v >= -1e-4, s"variance must be non-negative up to quantization, got $v")
      assert(cn >= 0.0)
    }
  }

  private def docs(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      rows.map { case (id, text) => Row(id, text) }.asJava,
      StructType.fromDDL("doc_id BIGINT, text STRING"))

  test("q238 identical docs land in the agree-32 bucket with exact jaccard 1") {
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val out = MinhashCal.calibrate(docs(Seq(
      (1L, text), (2L, text), (3L, other)))).collect()
    assert(out.length == 1, s"only the identical pair may band-collide: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(0) == 32L && r.getDouble(1) == 1.0)
    assert(r.getLong(2) == 1L && r.getDouble(3) == 1.0)
  }

  test("q238 estimator tracks exact jaccard on the real corpus (monotone-ish calibration)") {
    val rows = run("q238_minhash_calibration").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getLong(2)))
    assert(rows.nonEmpty)
    // weighted correlation proxy: the top agreement bucket's mean
    // exact jaccard must exceed the bottom bucket's
    val sorted = rows.sortBy(_._1)
    assert(sorted.last._2 >= sorted.head._2,
      s"calibration inverted: ${sorted.toSeq}")
  }
}
