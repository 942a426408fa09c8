package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.JoinAdvisor

/** q212 join-size cells: the Σ c_A(k)·c_B(k) fold equals the real
  * join cardinality, including duplicate keys and empty overlap.
  */
class AdvisorSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def keyed(rows: Seq[Long]) =
    spark.createDataFrame(rows.map(Row(_)).asJava,
      StructType.fromDDL("k BIGINT"))

  private def size(a: Seq[Long], b: Seq[Long]): Long =
    JoinAdvisor.joinSize(keyed(a), col("k"), keyed(b), col("k"))
      .collect()(0).getAs[Long]("rows")

  test("q212 cell fold equals the brute-force join count with duplicates") {
    val a = Seq(1L, 1L, 2L, 3L)
    val b = Seq(1L, 1L, 1L, 3L, 4L)
    val brute = (for (x <- a; y <- b if x == y) yield 1).size.toLong
    assert(size(a, b) == brute) // 2*3 + 1*1 = 7
    assert(brute == 7L)
  }

  test("q212 disjoint keys fold to exactly zero") {
    assert(size(Seq(1L, 2L), Seq(3L, 4L)) == 0L)
  }

  test("q212 fold is symmetric and scales multiplicatively") {
    val a = Seq.fill(5)(9L); val b = Seq.fill(7)(9L)
    assert(size(a, b) == 35L)
    assert(size(b, a) == 35L)
  }
}
