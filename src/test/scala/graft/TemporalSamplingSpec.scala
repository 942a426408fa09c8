package graft

import org.apache.spark.sql.functions._

/** q225 burstiness / q226 weighted sampling: hand-computed shape
  * fixtures and the A-ES weight-dominance property.
  */
class TemporalSamplingSpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types.StructType
  import scala.jdk.CollectionConverters._

  test("q225 constant-rate process has fano 0 and burstiness -1; a one-day burst is near +1's side") {
    // replicate the moment arithmetic on hand counts
    def stats(counts: Seq[Long]): (Double, Double) = {
      val n = counts.length.toLong
      val s1 = counts.sum
      val s2 = counts.map(c => c * c).sum
      val num = (n * s2 - s1 * s1).toDouble
      val fano = num / (n * s1).toDouble
      val sigma = math.sqrt(num) / n.toDouble
      val mu = s1.toDouble / n
      (fano, (sigma - mu) / (sigma + mu))
    }
    val (fConst, bConst) = stats(Seq.fill(10)(7L))
    assert(fConst == 0.0 && bConst == -1.0)
    val (fBurst, bBurst) = stats(70L +: Seq.fill(9)(0L))
    assert(fBurst > 1.0, s"one-day burst should be over-dispersed: $fBurst")
    assert(bBurst >= 0.5, s"one-day burst should be strongly bursty: $bBurst")
    // the corpus query emits one finite row per event type in range
    val out = run("q225_burstiness").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (f, b) = (r.getDouble(3), r.getDouble(4))
      assert(f >= 0.0 && !f.isNaN, s"fano $f")
      assert(b > -1.0 - 1e-12 && b < 1.0, s"burstiness $b")
    }
  }

  test("q226 A-ES: identical u, heavier weight ranks first; k cap and determinism hold") {
    // two docs with IDENTICAL text (same u) and different weights:
    // key = log2(u)/w with log2(u) < 0, so the heavier w is closer to
    // 0 and must win the rank
    val rows = Seq(
      Row(1L, "s", "same text", 10L),
      Row(2L, "s", "same text", 1000L),
      Row(3L, "s", "other words", 10L))
    val df = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("doc_id BIGINT, source STRING, text STRING, n_chars BIGINT"))
    val u = (expr("conv(substring(md5(text), 1, 8), 16, 10)").cast("long") + 1L)
      .cast("double") / lit(4294967296.0)
    val keyed = df.select(col("doc_id"),
      (log2(u) / col("n_chars").cast("double")).as("k"))
      .orderBy(col("k").desc, col("doc_id"))
      .collect().map(_.getLong(0))
    assert(keyed.indexOf(2L) < keyed.indexOf(1L),
      s"heavier weight did not dominate at equal u: ${keyed.toSeq}")
    // corpus-level contract: ≤ K rows per source, ranks 1..K, stable
    val a = run("q226_weighted_sample").collect()
    val b = run("q226_weighted_sample").collect()
    assert(a.toSeq == b.toSeq, "weighted sample not deterministic")
    val bySrc = a.groupBy(_.getString(0))
    bySrc.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }
}
