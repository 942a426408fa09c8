package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.Hits

/** q274 HITS: mutual recursion on a hand-built bipartite graph, the
  * normalization invariant, and corpus-level shape.
  */
class HitsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def edges(rows: Seq[(Long, Long)]) =
    spark.createDataFrame(
      rows.map { case (u, it) => Row(u, it) }.asJava,
      StructType.fromDDL("u BIGINT, it BIGINT"))

  test("a dense hub and a popular authority outrank peripheral nodes") {
    // item 1 is touched by users 1,2,3; items 2,3 only by user 1 —
    // user 1 (touches everything) is the top hub, item 1 the top
    // authority; user 4 touches only the peripheral item 4
    val g = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 1L -> 2L, 1L -> 3L, 4L -> 4L)
    val out = Hits.fromEdges(edges(g)).collect()
    val auth = out.filter(_.getString(0) == "authority")
    val hubs = out.filter(_.getString(0) == "hub")
    assert(auth.head.getLong(1) === 1L)
    assert(hubs.head.getLong(1) === 1L)
    // normalization: each list's max score is exactly 10^6
    assert(auth.head.getLong(2) === 1000000L)
    assert(hubs.head.getLong(2) === 1000000L)
    // the peripheral user ranks strictly below the dense hub
    val hubScore = hubs.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(hubScore(4L) < hubScore(1L))
  }

  test("q274 on the corpus: both kinds present, scores normalized and ordered") {
    val rows = run("q274_hits").collect()
    val byKind = rows.groupBy(_.getString(0))
    assert(byKind.keySet === Set("authority", "hub"))
    byKind.values.foreach { rs =>
      assert(rs.length <= 20)
      assert(rs.head.getLong(2) === 1000000L)
      val scores = rs.map(_.getLong(2)).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }
}
