package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.RefIntegrity

/** q180 referential integrity: synthetic orphans/NULLs prove the
  * counters count (the corpus itself is clean, so the oracle only
  * pins absence), duplicate child keys split rows-vs-keys, and a
  * non-unique parent must not inflate anything.
  */
class RefIntegritySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def run(child: Seq[java.lang.Long], parent: Seq[Long]) = {
    val c = spark.createDataFrame(
      child.map(Row(_)).asJava, StructType.fromDDL("fk BIGINT"))
    val p = spark.createDataFrame(
      parent.map(Row(_)).asJava, StructType.fromDDL("pk BIGINT"))
    val r = RefIntegrity.audit(c, "fk", p, "pk", "t").collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  private def L(x: Long): java.lang.Long = java.lang.Long.valueOf(x)

  test("q180 clean relationship: zero orphans, zero nulls") {
    assert(run(Seq(L(1), L(2), L(2), L(3)), Seq(1L, 2L, 3L, 4L)) ==
      ((4L, 0L, 3L, 0L, 0L)))
  }

  test("q180 orphans: key-grain and row-grain counts diverge") {
    // fk 9 appears 3x and has no parent; fk 8 appears once, orphaned
    assert(run(Seq(L(1), L(9), L(9), L(9), L(8)), Seq(1L, 2L)) ==
      ((5L, 0L, 3L, 2L, 4L)))
  }

  test("q180 NULL keys are ledgered, never counted as orphans") {
    assert(run(Seq(L(1), null, null), Seq(1L)) ==
      ((3L, 2L, 1L, 0L, 0L)))
  }

  test("q180 duplicate parent keys do not inflate child counts") {
    assert(run(Seq(L(1), L(1), L(7)), Seq(1L, 1L, 1L)) ==
      ((3L, 0L, 2L, 1L, 1L)))
  }

  test("q180 empty child: all-zero row") {
    assert(run(Seq.empty, Seq(1L)) == ((0L, 0L, 0L, 0L, 0L)))
  }
}
