package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.DictAdvisor

/** q215 dictionary advisor: hand-computed byte accounting, the
  * bit-length ladder, and both advice outcomes.
  */
class DictAdvisorSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(vals: Seq[String]) =
    spark.createDataFrame(vals.map(Row(_)).asJava,
      StructType.fromDDL("v STRING"))

  private def run(vals: Seq[String]) = {
    val r = DictAdvisor.advise(df(vals), "t", "v").collect()(0)
    (r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct"),
      r.getAs[Long]("plain_bytes"), r.getAs[Long]("dict_bytes"),
      r.getAs[Long]("index_bytes"), r.getAs[String]("advice"))
  }

  test("q215 hand-computed accounting: repetitive column wants dictionary") {
    // 100 rows of two 10-byte values: plain 1000; dict page 20 + 100*1
    val out = run(Seq.tabulate(100)(i => if (i % 2 == 0) "aaaaaaaaaa" else "bbbbbbbbbb"))
    assert(out == ((100L, 2L, 1000L, 120L, 1L, "dictionary")))
  }

  test("q215 all-unique short column wants plain") {
    // 300 distinct 2-3 byte values: dict page ~= plain AND pays indexes
    val vals = (0 until 300).map(_.toString)
    val (n, d, plain, dict, idx, advice) = run(vals)
    assert(n == 300L && d == 300L)
    assert(idx == 2L) // ceil(ceil(log2 300)/8) = ceil(9/8) = 2
    assert(dict == plain + 300L * 2L)
    assert(advice == "plain")
  }

  test("q215 bit-length ladder: exact byte steps at powers of two") {
    def idxBytes(nDistinct: Int): Long =
      run((0 until nDistinct).map(i => f"x$i%05d"))._5
    assert(idxBytes(2) == 1L)     // 1 bit
    assert(idxBytes(256) == 1L)   // 8 bits
    assert(idxBytes(257) == 2L)   // 9 bits
    assert(idxBytes(1) == 1L)     // degenerate floor
  }
}
