package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.CmsCal

/** q271 count–min calibration: cell/probe arithmetic cross-checked
  * against an independent JVM md5 implementation, the
  * never-underestimate invariant, and a planted heavy hitter. (The
  * oracle gate proves DuckDB replays every cell; these pin the
  * semantics.)
  */
class CmsCalSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val D = 4
  private val W = 16L

  private def docs(texts: Seq[String]) =
    spark.createDataFrame(
      texts.map(Row(_)).asJava, StructType.fromDDL("text STRING"))

  /** Independent estimate derivation: JVM MessageDigest md5 over the
    * same tokenization — same bytes in must give the same sketch.
    */
  private def expected(texts: Seq[String]): Map[String, (Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = texts.flatMap(_.trim.split("\\s+"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    val keys = counts.map { case (tok, c) =>
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      val a = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val s = java.lang.Long.parseLong(hex.substring(8, 16), 16) | 1L
      (0 until D).foreach { j =>
        val pos = (a + j * s) % W
        cells((j, pos)) = cells.getOrElse((j, pos), 0L) + c
      }
      tok -> (a, s)
    }
    keys.map { case (tok, (a, s)) =>
      val est = (0 until D).map(j => cells((j, (a + j * s) % W))).min
      tok -> (counts(tok), est)
    }.toMap
  }

  test("q271 estimates match an independent JVM md5 sketch derivation") {
    val texts = (1 to 30).map(i => s"alpha$i beta${i % 7} gamma")
    val out = CmsCal.report(docs(texts)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exp = expected(texts)
    // <= 50 distinct tokens here, so the report covers the full vocab
    assert(out.keySet === exp.keySet)
    out.foreach { case (tok, (n, est)) =>
      assert((n, est) === exp(tok), s"token $tok")
    }
  }

  test("q271 never underestimates and flags a planted heavy hitter") {
    val out = run("q271_cms_cal").collect()
    // the sf0.001 corpus vocabulary is only 31 tokens, under the K=50
    // cut — the report covers whichever is smaller
    assert(out.nonEmpty && out.length <= 50)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)} est ${r.getLong(2)} < true ${r.getLong(1)}")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
      assert(r.getLong(4) === r.getLong(3) * 1000 / r.getLong(1))
    }
    // the heaviest planted token dominates: a token repeated 200x in a
    // 40-doc corpus whose other tokens appear <= 40x must be reported
    val planted = CmsCal.report(docs(
      (1 to 40).map(i => s"filler$i common heavy heavy heavy heavy heavy")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(planted("heavy") === 200L)
    assert(planted("common") === 40L)
  }
}
