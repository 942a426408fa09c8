package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Bpe

/** q213 tokenizer fertility: the ≥ 1 tokens-per-word floor, monotone
  * improvement in merges, and a hand-computed per-language rollup.
  */
class FertilitySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docs(rows: Seq[(String, String)]) =
    spark.createDataFrame(
      rows.map { case (l, t) => Row(l, t) }.asJava,
      StructType.fromDDL("lang STRING, text STRING"))

  private def counts(rows: Seq[(String, String)],
      merges: Seq[(String, String)]) =
    docs(rows).select(col("lang"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("w"),
      Bpe.tokenCount(col("text"), merges).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  private val corpus = Seq(
    ("en", "the cat sat on the mat"),
    ("en", "the dog sat"),
    ("de", "der hund sass"))

  test("q213 fertility floor: every word is at least one token") {
    for (nm <- Seq(0, 5, 50)) {
      val merges = Bpe.learnFromCorpus(docs(corpus), "text", 100, nm)
      counts(corpus, merges).foreach { case (_, w, t) =>
        assert(t >= w, s"tokens $t < words $w at $nm merges")
      }
    }
  }

  test("q213 more merges never increase the token count") {
    val m10 = Bpe.learnFromCorpus(docs(corpus), "text", 100, 10)
    val m50 = Bpe.learnFromCorpus(docs(corpus), "text", 100, 50)
    val t10 = counts(corpus, m10).map(_._3).sum
    val t50 = counts(corpus, m50).map(_._3).sum
    assert(t50 <= t10)
  }

  test("q213 zero merges tokenize to characters: hand-computed fertility") {
    val rows = Seq(("xx", "ab cd"), ("yy", "abc"))
    val out = counts(rows, Seq.empty).map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("xx") == ((2L, 4L))) // a|b + c|d
    assert(out("yy") == ((1L, 3L))) // a|b|c
  }
}
