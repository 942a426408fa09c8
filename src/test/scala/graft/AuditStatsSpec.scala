package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.{FdAudit, MutualInfo, Psi, SkewAudit}

/** q196 skew audit / q197 FD audit / q198 mutual information /
  * q199 PSI: hand-computed fixtures, textbook identities
  * (independence ⇒ MI = 0, identical ⇒ MI = H), zero-drift and
  * one-sided-bin ledgers, uniform-vs-hot-key contrasts.
  */
class AuditStatsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def keyed(rows: Seq[Long]) =
    spark.createDataFrame(rows.map(Row(_)).asJava,
      StructType.fromDDL("k BIGINT"))

  // ---- q196 skew audit ----

  test("q196 uniform keys: skew 100, salt 1, selfjoin = n·c") {
    // 4 keys × 3 rows each
    val r = SkewAudit.keyAudit(keyed(
      (1L to 4L).flatMap(k => Seq.fill(3)(k))), col("k"), "t").collect()(0)
    assert(r.getAs[Long]("n_rows") == 12L && r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("skew_x100") == 100L)
    assert(r.getAs[Long]("salt_suggest") == 1L)
    assert(r.getAs[Long]("selfjoin_rows") == 4L * 9L)
  }

  test("q196 hot key dominates: skew and salt scale with the hot count") {
    // key 1 ×10, keys 2..5 ×1 → mean 2.8, max 10
    val r = SkewAudit.keyAudit(keyed(
      Seq.fill(10)(1L) ++ (2L to 5L)), col("k"), "t").collect()(0)
    assert(r.getAs[Long]("max_cnt") == 10L)
    assert(r.getAs[Long]("selfjoin_rows") == 100L + 4L)
    // 100·10·5/14 = 357.14… → floor 357; ceil(10·5/14) = ceil(3.57) = 4
    assert(r.getAs[Long]("skew_x100") == 357L)
    assert(r.getAs[Long]("salt_suggest") == 4L)
  }

  // ---- q197 FD audit ----

  private def fdDf(rows: Seq[(Long, String)]) =
    spark.createDataFrame(rows.map { case (l, r) => Row(l, r) }.asJava,
      StructType.fromDDL("l BIGINT, r STRING"))

  test("q197 a holding FD reports zero violations") {
    val r = FdAudit.fdAudit(fdDf(Seq((1L, "a"), (1L, "a"), (2L, "b"))),
      col("l"), col("r"), "t").collect()(0)
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_violating") == 0L)
    assert(r.getAs[Long]("max_rhs") == 1L)
    assert(r.getAs[Long]("violation_ppm") == 0L)
  }

  test("q197 planted violation is counted with its worst witness") {
    // lhs 1 → {a, b, c}, lhs 2 → {a}, lhs 3 → {a, b}
    val r = FdAudit.fdAudit(fdDf(Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (3L, "a"), (3L, "b"),
      (3L, "b"))), col("l"), col("r"), "t").collect()(0)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_violating") == 2L)
    assert(r.getAs[Long]("max_rhs") == 3L)
    assert(r.getAs[Long]("violation_ppm") == 666666L)
  }

  // ---- q198 mutual information ----

  private def xy(rows: Seq[(Long, Long)]) =
    spark.createDataFrame(rows.map { case (x, y) => Row(x, y) }.asJava,
      StructType.fromDDL("x BIGINT, y BIGINT"))

  private def mi(rows: Seq[(Long, Long)]): Row =
    MutualInfo.mutualInfo(xy(rows), col("x"), col("y")).collect()(0)

  test("q198 independent uniform table has MI = 0") {
    val r = mi(for (x <- 0L to 1L; y <- 0L to 1L; _ <- 1 to 5) yield (x, y))
    assert(math.abs(r.getAs[Double]("mi")) < 1e-5)
  }

  test("q198 identical columns: MI = H and NMI = 1") {
    val r = mi(Seq.fill(3)((0L, 0L)) ++ Seq.fill(5)((1L, 1L)) ++
      Seq.fill(2)((2L, 2L)))
    assert(math.abs(r.getAs[Double]("mi") - r.getAs[Double]("h_x")) < 1e-12)
    assert(math.abs(r.getAs[Double]("nmi") - 1.0) < 1e-9)
  }

  test("q198 hand-computed 2x2 dependence") {
    val rows = Seq.fill(2)((0L, 0L)) ++ Seq((0L, 1L), (1L, 0L)) ++
      Seq.fill(2)((1L, 1L))
    val expected = 2.0 / 3.0 * math.log(4.0 / 3.0) +
      1.0 / 3.0 * math.log(2.0 / 3.0)
    val r = mi(rows)
    assert(math.abs(r.getAs[Double]("mi") - expected) < 1e-4)
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("n_cells") == 4L)
  }

  // ---- q199 PSI ----

  private def psiOf(rows: Seq[(Boolean, Long)]): Row =
    Psi.psiByKey(
      spark.createDataFrame(
        rows.map { case (ref, b) => Row("k", ref, b) }.asJava,
        StructType.fromDDL("key STRING, ref BOOLEAN, b BIGINT")),
      col("key"), col("ref"), col("b")).collect()(0)

  test("q199 identical distributions give PSI = 0") {
    val dist = Seq(0L, 0L, 1L, 2L)
    val r = psiOf(dist.map((true, _)) ++ dist.map((false, _)))
    assert(math.abs(r.getAs[Double]("psi")) < 1e-5)
    assert(r.getAs[Long]("n_new") == 0L && r.getAs[Long]("n_gone") == 0L)
  }

  test("q199 hand-computed shift: 3:1 → 1:3 gives PSI = ln 3 + ln 3 halved") {
    val r = psiOf(
      (Seq.fill(3)(0L) ++ Seq(1L)).map((true, _)) ++
        (Seq(0L) ++ Seq.fill(3)(1L)).map((false, _)))
    val expected = 0.5 * math.log(3.0) + 0.5 * math.log(3.0)
    assert(math.abs(r.getAs[Double]("psi") - expected) < 1e-4)
    assert(r.getAs[Long]("n_common") == 2L)
  }

  test("q199 one-sided bins land in the new/gone ledger, not the sum") {
    val r = psiOf(
      (Seq.fill(3)(0L) ++ Seq.fill(2)(9L)).map((true, _)) ++
        (Seq.fill(3)(0L) ++ Seq.fill(4)(5L)).map((false, _)))
    assert(r.getAs[Long]("n_gone") == 1L && r.getAs[Long]("gone_rows") == 2L)
    assert(r.getAs[Long]("n_new") == 1L && r.getAs[Long]("new_rows") == 4L)
    // common mass: ref 3/5 vs cur 3/7 over bin 0 only
    val expected = (3.0 / 5.0 - 3.0 / 7.0) * math.log((3.0 / 5.0) / (3.0 / 7.0))
    assert(math.abs(r.getAs[Double]("psi") - expected) < 1e-4)
  }
}
