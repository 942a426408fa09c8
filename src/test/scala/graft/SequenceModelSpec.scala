package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{Changepoint, Markov}

/** Behavioral checks for q138 (integer CUSUM changepoint) and q139
  * (Markov transition matrix): a hand-computed step-shift series
  * where both one-sided peaks and their argmax days are derivable on
  * paper, the flat-series zero, the textbook-recursion equivalence
  * S_t = max(0, S_{t-1}+dev_t) on a random series, a deterministic
  * two-user chain for the transition matrix, and the row-
  * normalization invariant Σ_next p = 1.
  */
class SequenceModelSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // ---- q138: CUSUM ----

  test("q138 flat series has zero peaks at the first day") {
    val out = Changepoint.cusum(
      df("k STRING, d LONG, n LONG")((1L to 5L).map(d => Row("a", d, 7L))),
      "k", "d", "n").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("peak_up") == 0L && r.getAs[Long]("peak_down") == 0L)
    assert(r.getAs[Long]("day_up") == 1L && r.getAs[Long]("day_down") == 1L)
    assert(r.getAs[Long]("n_days") == 5L && r.getAs[Long]("total") == 35L)
  }

  test("q138 step shift: hand-computed peaks and argmax days") {
    // n = [1,1,1,5,5,5], D=6, T=18 → dev = n*6-18 = [-12×3, +12×3]
    // cum = [-12,-24,-36,-24,-12,0]
    // s_pos = cum - min(0, run-min cum) = [0,0,0,12,24,36] → peak 36 @ d6
    // s_neg = max(0, run-max cum) - cum = [12,24,36,24,12,0] → peak 36 @ d3
    val ns = Seq(1L, 1L, 1L, 5L, 5L, 5L)
    val out = Changepoint.cusum(
      df("k STRING, d LONG, n LONG")(ns.zipWithIndex.map { case (n, i) => Row("a", i + 1L, n) }),
      "k", "d", "n").collect().head
    assert(out.getAs[Long]("peak_up") == 36L && out.getAs[Long]("day_up") == 6L)
    assert(out.getAs[Long]("peak_down") == 36L && out.getAs[Long]("day_down") == 3L)
  }

  test("q138 matches the textbook recursion on a fixed random series") {
    val rnd = new scala.util.Random(138)
    val ns = (1 to 40).map(_ => rnd.nextInt(50).toLong)
    val d = ns.length.toLong
    val t = ns.sum
    val dev = ns.map(_ * d - t)
    // recursion: S_t = max(0, S_{t-1} + dev_t); T_t = max(0, T_{t-1} - dev_t)
    val sPos = dev.scanLeft(0L)((s, x) => math.max(0L, s + x)).tail
    val sNeg = dev.scanLeft(0L)((s, x) => math.max(0L, s - x)).tail
    val out = Changepoint.cusum(
      df("k STRING, d LONG, n LONG")(ns.zipWithIndex.map { case (n, i) => Row("a", i + 1L, n) }),
      "k", "d", "n").collect().head
    assert(out.getAs[Long]("peak_up") == sPos.max)
    assert(out.getAs[Long]("peak_down") == sNeg.max)
    assert(out.getAs[Long]("day_up") == sPos.indexOf(sPos.max) + 1L)
    assert(out.getAs[Long]("day_down") == sNeg.indexOf(sNeg.max) + 1L)
  }

  test("q138 keys are independent: a flat key next to a shifted key stays zero") {
    val rows = (1L to 4L).map(d => Row("flat", d, 3L)) ++
      Seq(Row("shift", 1L, 1L), Row("shift", 2L, 1L), Row("shift", 3L, 4L), Row("shift", 4L, 4L))
    val out = Changepoint.cusum(df("k STRING, d LONG, n LONG")(rows), "k", "d", "n")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("flat").getAs[Long]("peak_up") == 0L)
    assert(out("shift").getAs[Long]("peak_up") > 0L)
  }

  // ---- q139: Markov transitions ----

  test("q139 deterministic alternating chain gives p=1 both ways") {
    // u1: A,B,A,B,A → A→B ×2, B→A ×2
    val rows = Seq("A", "B", "A", "B", "A").zipWithIndex.map { case (e, i) =>
      Row("u1", i + 1L, i + 1L, e)
    }
    val out = Markov.transitions(
      df("u STRING, ts LONG, id LONG, e STRING")(rows), "u", "ts", "id", "e")
      .collect().map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) -> r).toMap
    assert(out.size == 2)
    assert(out(("A", "B")).getAs[Long]("n") == 2L)
    assert(out(("A", "B")).getAs[Double]("p") == 1.0)
    assert(out(("B", "A")).getAs[Double]("p") == 1.0)
    assert(out(("A", "B")).getAs[Long]("rnk") == 1L)
  }

  test("q139 multi-successor counts, probabilities, and ranks") {
    // u2: A,B,A,C,A,B → from A: B×2 (p=2/3, rnk 1), C×1 (p=1/3, rnk 2)
    val rows = Seq("A", "B", "A", "C", "A", "B").zipWithIndex.map { case (e, i) =>
      Row("u2", i + 1L, i + 1L, e)
    }
    val out = Markov.transitions(
      df("u STRING, ts LONG, id LONG, e STRING")(rows), "u", "ts", "id", "e")
      .collect().map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) -> r).toMap
    assert(out(("A", "B")).getAs[Long]("n") == 2L && out(("A", "B")).getAs[Long]("rnk") == 1L)
    assert(out(("A", "C")).getAs[Long]("n") == 1L && out(("A", "C")).getAs[Long]("rnk") == 2L)
    assert(out(("A", "B")).getAs[Long]("n_from") == 3L)
    assert(math.abs(out(("A", "B")).getAs[Double]("p") - 2.0 / 3.0) < 1e-15)
  }

  test("q139 rows normalize: sum of p over next = 1 per prev state") {
    val rnd = new scala.util.Random(139)
    val states = Seq("A", "B", "C", "D")
    val rows = (1 to 8).flatMap { u =>
      (1 to 30).map(i => Row(s"u$u", i.toLong, i.toLong, states(rnd.nextInt(4))))
    }
    val sums = Markov.transitions(
      df("u STRING, ts LONG, id LONG, e STRING")(rows), "u", "ts", "id", "e")
      .groupBy("prev_type").agg(org.apache.spark.sql.functions.sum("p").as("sp"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getAs[Double]("sp") - 1.0) < 1e-12))
  }

  test("q139 same-ts events order by id: the q124 tiebreak lesson") {
    // all ts equal; id decides A→B→C, so transitions are A→B, B→C
    val rows = Seq(Row("u3", 5L, 3L, "C"), Row("u3", 5L, 1L, "A"), Row("u3", 5L, 2L, "B"))
    val out = Markov.transitions(
      df("u STRING, ts LONG, id LONG, e STRING")(rows), "u", "ts", "id", "e")
      .collect().map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")))
    assert(out.toSet == Set(("A", "B"), ("B", "C")))
  }
}
