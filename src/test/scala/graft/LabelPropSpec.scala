package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.LabelProp

/** q214 label propagation: the two-triangles-with-a-bridge fixture
  * replayed by hand through all three synchronous rounds, tiebreak
  * determinism, and the single-clique collapse.
  */
class LabelPropSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def edges(pairs: Seq[(Long, Long)]) =
    spark.createDataFrame(
      pairs.map { case (a, b) => Row(a, b) }.asJava,
      StructType.fromDDL("pa BIGINT, pb BIGINT"))

  private def labels(pairs: Seq[(Long, Long)], rounds: Int) =
    LabelProp.propagate(edges(pairs), rounds)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("lbl")).toMap

  // triangle {1,2,3}, triangle {4,5,6}, bridge 3-4
  private val bridged = Seq((1L, 2L), (1L, 3L), (2L, 3L),
    (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))

  test("q214 hand-replayed three rounds separate the two triangles") {
    // hand replay with (count desc, label asc) tiebreak:
    // r1: 1->2, 2->1, 3->1, 4->3, 5->4, 6->4
    // r2: 1->1, 2->1, 3->1, 4->4, 5->3, 6->3
    // r3: 1->1, 2->1, 3->1, 4->3, 5->3, 6->3
    val out = labels(bridged, 3)
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("q214 intermediate rounds match the hand replay too") {
    assert(labels(bridged, 1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 4L, 6L -> 4L))
    assert(labels(bridged, 2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L))
  }

  test("q214 a clique collapses to its minimum node label") {
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val out = labels(clique.toSeq, 3)
    assert(out.values.toSet == Set(1L))
  }

  test("q214 runs are deterministic") {
    assert(labels(bridged, 3) == labels(bridged, 3))
  }
}
