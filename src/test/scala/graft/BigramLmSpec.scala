package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.BigramLm

/** q183 bigram LM: hand-computed add-1 probabilities, unseen-bigram
  * and unseen-context floors, train/score isolation, and the
  * single-token guard.
  */
class BigramLmSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docs(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      rows.map { case (id, t) => Row(id, t) }.asJava,
      StructType.fromDDL("doc_id LONG, text STRING"))

  private def score(train: Seq[(Long, String)], held: Seq[(Long, String)]) =
    BigramLm.score(docs(train), docs(held))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("q183 hand-computed: repeated bigram beats smoothing floor") {
    // train: "a b a b" -> bigrams (a,b)x2? No: a b, b a, a b -> c2(a,b)=2,
    // c2(b,a)=1; c1(a)=2, c1(b)=1; V=2
    val out = score(Seq((1L, "a b a b")), Seq((2L, "a b")))
    // held "a b": p = (2+1)/(2+2) = 0.75
    assert(out(2L) == ((1L, 1L, 0.75)))
  }

  test("q183 unseen bigram in seen context uses 1/(c1+V)") {
    // train c1(a)=2, V=2; held "a a": bigram (a,a) unseen
    // p = (0+1)/(2+2) = 0.25
    val out = score(Seq((1L, "a b a b")), Seq((2L, "a a")))
    assert(out(2L) == ((1L, 0L, 0.25)))
  }

  test("q183 unseen context falls to 1/V") {
    // held "z q": context z unseen -> p = 1/(0+2) = 0.5
    val out = score(Seq((1L, "a b a b")), Seq((2L, "z q")))
    assert(out(2L) == ((1L, 0L, 0.5)))
  }

  test("q183 held-only bigrams never train the model") {
    // if held data leaked into training, (z,q) would be seen
    val out = score(Seq((1L, "a b")), Seq((2L, "z q"), (3L, "z q")))
    assert(out(2L)._2 == 0L && out(3L)._2 == 0L)
  }

  test("q183 single-token and empty docs produce no bigram rows") {
    val out = score(Seq((1L, "a b")), Seq((2L, "solo"), (3L, "x y")))
    assert(!out.contains(2L))
    assert(out(3L)._1 == 1L)
  }

  test("q183 mean over mixed bigrams matches by-hand decimal sum") {
    // train "a b a b": c2(a,b)=2, c2(b,a)=1, c1(a)=2, c1(b)=1, V=2
    // held "a b a": pairs (a,b) p=3/4, (b,a) p=(1+1)/(1+2)=2/3
    // quantized: 0.750000 + 0.666667 = 1.416667 -> /2
    val out = score(Seq((1L, "a b a b")), Seq((2L, "a b a")))
    assert(out(2L)._1 == 2L && out(2L)._2 == 2L)
    assert(math.abs(out(2L)._3 - 1.416667 / 2) < 1e-12)
  }
}
