package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.EmbedDrift

/** q261 embedding drift: hand-computed per-cell means on planted
  * geometry, the no-delta/no-base NULL guards, and delta membership
  * by `vec_id % 5`. (The oracle gate proves DuckDB replays every
  * cosine; these pin the semantics.)
  */
class EmbedDriftSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def vecs(rows: Seq[(Long, Seq[Double])]) =
    spark.createDataFrame(
      rows.map { case (id, v) => Row(id, v) }.asJava,
      StructType.fromDDL("vec_id BIGINT, v ARRAY<DOUBLE>"))

  test("q261 per-cell means and drift on planted geometry") {
    // anchors: 0 -> (1,0)  [delta: 0 % 5 = 0], 1 -> (0,1) [base]
    // members: 2 -> (2,0): cluster 0, cos 1, base
    //          5 -> (3,1): cluster 0, cos 3/sqrt(10) = 0.948683..., delta
    val out = EmbedDrift.drift(vecs(Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(2.0, 0.0)), (5L, Seq(3.0, 1.0)))), anchors = 2, deltaMod = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    val c0 = out(0L)
    assert(c0.getLong(1) == 1L && c0.getLong(2) == 2L,
      s"cluster 0 holds 1 base (vec 2) + 2 delta (anchors 0, member 5): $c0")
    assert(c0.getDouble(3) == 1.0, s"base mean is exactly 1: $c0")
    // delta mean = (1.000000 + 0.948683) / 2 over D18_6-quantized cosines
    assert(math.abs(c0.getDouble(4) - 0.9743415) < 1e-9, s"$c0")
    assert(math.abs(c0.getDouble(5) - 0.0256585) < 1e-9, s"$c0")
    // cluster 1: its anchor only (base) -> delta mean and drift NULL
    val c1 = out(1L)
    assert(c1.getLong(1) == 1L && c1.getLong(2) == 0L, s"$c1")
    assert(!c1.isNullAt(3) && c1.isNullAt(4) && c1.isNullAt(5),
      s"no-delta cell must NULL its delta mean and drift: $c1")
  }

  test("q261 real embeddings: every cell accounted, drift bounded by [-2, 2]") {
    val rows = run("q261_embedding_drift").collect()
    assert(rows.length == 16, s"16 anchor cells, got ${rows.length}")
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(total == n, s"cells hold $total vectors, corpus has $n")
    rows.filter(!_.isNullAt(5)).foreach { r =>
      val d = r.getDouble(5)
      assert(d >= -2.0 && d <= 2.0, s"drift out of cosine range: $r")
    }
  }
}
