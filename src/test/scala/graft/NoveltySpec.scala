package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.Novelty

/** q186 novelty curve: hand-built first/zero/partial novelty corpus,
  * within-doc repetition collapse, and the short-doc gate.
  */
class NoveltySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def run(docs: Seq[(Long, String)], k: Int = 3) = {
    val df = spark.createDataFrame(
      docs.map { case (id, t) => Row(id, t) }.asJava,
      StructType.fromDDL("doc_id LONG, text STRING"))
    Novelty.curve(df, k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("q186 first doc is all-novel, a copy is zero-novel, overlap is partial") {
    val out = run(Seq(
      (1L, "a b c d"),      // shingles (k=3): abc, bcd -> both novel
      (2L, "a b c d"),      // exact copy -> zero novel
      (3L, "b c d e")))     // bcd (seen), cde (new) -> 1/2
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    assert(out(3L) == ((2L, 1L, 0.5)))
  }

  test("q186 within-doc repetition collapses: repeated shingle counts once") {
    // "a b a b a b" k=3 shingles: aba, bab, aba, bab -> distinct {aba, bab}
    val out = run(Seq((1L, "a b a b a b")))
    assert(out(1L) == ((2L, 2L, 1.0)))
  }

  test("q186 docs shorter than k emit no row") {
    val out = run(Seq((1L, "a b"), (2L, "a b c")))
    assert(!out.contains(1L))
    assert(out(2L)._1 == 1L)
  }

  test("q186 first occurrence goes to the SMALLEST doc_id") {
    val out = run(Seq((5L, "x y z"), (2L, "x y z")))
    assert(out(2L) == ((1L, 1L, 1.0)))
    assert(out(5L) == ((1L, 0L, 0.0)))
  }

  test("q186 novel counts sum to the corpus-distinct shingle count") {
    val rnd = new scala.util.Random(186186L)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val out = run(docs)
    val allShingles = docs.flatMap { case (_, t) =>
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    }.toSet
    assert(out.values.map(_._2).sum == allShingles.size.toLong)
  }
}
