package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{Benford, LDiversity, Survival, TCloseness}

/** Behavioral checks for q142 (Kaplan-Meier survival), q143 (Benford
  * first-digit audit), q174 (l-diversity) and q205 (t-closeness): the
  * textbook KM worked example with interleaved censoring, the
  * everyone-churns collapse to S = 0, the censored-only tail keeping
  * S flat, an exact-Benford sample with chi2 ~ 0, a constant-digit
  * counterexample blowing chi2 up, the homogeneity attack, and the
  * hand-computed total-variation EMD cases incl. the exact t-boundary.
  */
class AuditSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  private def kmRows(durs: Seq[(Long, Boolean)]) =
    Survival.km(
      df("dur LONG, churned BOOLEAN")(durs.map { case (d, e) => Row(d, e) }),
      "dur", "churned")
      .orderBy("t").collect()

  // ---- q142: Kaplan-Meier ----

  test("q142 textbook worked example with interleaved censoring") {
    // Subjects: churn@1, churn@1, censor@2, churn@3, censor@3
    //   t=1: n=5, d=2  → S = 3/5                       = 0.6
    //   t=2: n=3, d=0  → S unchanged                   = 0.6
    //   t=3: n=2, d=1  → S = 0.6 * 1/2                 = 0.3
    val out = kmRows(Seq((1L, true), (1L, true), (2L, false), (3L, true), (3L, false)))
    assert(out.map(_.getAs[Long]("t")).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n_at_risk")).toSeq == Seq(5L, 3L, 2L))
    assert(out.map(_.getAs[Long]("d")).toSeq == Seq(2L, 0L, 1L))
    assert(out.map(_.getAs[Long]("c")).toSeq == Seq(0L, 1L, 1L))
    val s = out.map(_.getAs[Double]("surv"))
    assert(math.abs(s(0) - 0.6) < 1e-3 && math.abs(s(1) - 0.6) < 1e-3)
    assert(math.abs(s(2) - 0.3) < 1e-3)
  }

  test("q142 d = n collapse: survival hits exactly 0.0 and stays there") {
    // t=1: 1 of 3 churns (S=2/3); t=2: BOTH remaining churn (d=n → 0).
    val out = kmRows(Seq((1L, true), (2L, true), (2L, true)))
    val s = out.map(_.getAs[Double]("surv"))
    assert(math.abs(s(0) - 2.0 / 3.0) < 1e-3)
    assert(s(1) == 0.0)
  }

  test("q142 censoring alone never moves the curve") {
    val out = kmRows(Seq((1L, true), (2L, false), (3L, false), (4L, false)))
    val s = out.map(_.getAs[Double]("surv"))
    assert(s.forall(v => math.abs(v - 0.75) < 1e-3))
  }

  // ---- q143: Benford ----

  test("q143 exact-Benford sample has chi2 ~ 0 and full spine") {
    // 1000 * log10(1+1/d) rounded: 301,176,125,97,79,67,58,51,46
    val counts = Seq(301, 176, 125, 97, 79, 67, 58, 51, 46)
    val rows = counts.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)(Row((i + 1) * 100.0 + 7.0))
    }
    val out = Benford.audit(df("v DOUBLE")(rows), "v").orderBy("digit").collect()
    assert(out.length == 9)
    assert(out.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    assert(out.map(_.getAs[Long]("n_obs")).sum == counts.sum.toLong)
    assert(out.head.getAs[Double]("chi2") < 0.1)
  }

  test("q143 constant-digit data blows the statistic up, zero digits still charged") {
    val out = Benford.audit(df("v DOUBLE")(Seq.fill(900)(Row(9000.0))), "v")
      .orderBy("digit").collect()
    // digit 9 observed 900, all others 0 but present with expected mass
    assert(out.count(_.getAs[Long]("n_obs") == 0L) == 8)
    assert(out.last.getAs[Long]("n_obs") == 900L)
    assert(out.head.getAs[Double]("chi2") > 1000.0)
  }

  test("q143 digit extraction is integer-exact at powers of ten and sub-1 filter") {
    val out = Benford.audit(
      df("v DOUBLE")(Seq(Row(1000.0), Row(999.99), Row(0.5), Row(10.0))), "v")
      .orderBy("digit").collect()
    val byDigit = out.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n_obs")).toMap
    assert(byDigit(1) == 2L && byDigit(9) == 1L) // 0.5 filtered out
    assert(out.head.getAs[Long]("n_total") == 3L)
  }

  // ---- q174: l-diversity ----

  private def ldiv(rows: Seq[(String, String, String)]) =
    LDiversity.audit(
      df("a STRING, b STRING, s STRING")(rows.map { case (x, y, z) => Row(x, y, z) }),
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"),
      org.apache.spark.sql.functions.col("s"), 3)
      .collect()
      .map(r => (r.getAs[String]("qa"), r.getAs[String]("qb")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("l_distinct"),
          r.getAs[Double]("max_share"), r.getAs[Boolean]("at_risk"))))
      .toMap

  test("q174 homogeneous k-large group is exactly the attack k-anonymity misses") {
    val out = ldiv(
      Seq.fill(20)(("n1", "SEG", "premium")) ++ // k-safe, zero diversity
        Seq(("n2", "SEG", "premium"), ("n2", "SEG", "standard"),
          ("n2", "SEG", "delinquent"), ("n2", "SEG", "premium")))
    assert(out(("n1", "SEG")) == ((20L, 1L, 1.0, true)))
    assert(out(("n2", "SEG")) == ((4L, 3L, 0.5, false)))
  }

  test("q174 max_share is the exact largest-cell ratio") {
    val out = ldiv(Seq(("n", "S", "a"), ("n", "S", "a"), ("n", "S", "a"),
      ("n", "S", "b"), ("n", "S", "c")))
    assert(out(("n", "S")) == ((5L, 3L, 3.0 / 5.0, false)))
  }

  // ---- q205 t-closeness ----

  private def tclose(rows: Seq[(String, String, String)]) =
    TCloseness.audit(
      df("a STRING, b STRING, s STRING")(rows.map { case (x, y, z) => Row(x, y, z) }),
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"),
      org.apache.spark.sql.functions.col("s"))
      .collect()
      .map(r => (r.getAs[String]("qa"), r.getAs[String]("qb")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("emd"),
          r.getAs[Boolean]("at_risk"))))
      .toMap

  test("q205 group mirroring the global distribution has EMD exactly 0") {
    val out = tclose(
      Seq(("g1", "S", "x"), ("g1", "S", "x"), ("g1", "S", "y"), ("g1", "S", "y"),
        ("g2", "S", "x"), ("g2", "S", "x"), ("g2", "S", "y"), ("g2", "S", "y")))
    assert(out(("g1", "S")) == ((4L, 0.0, false)))
    assert(out(("g2", "S")) == ((4L, 0.0, false)))
  }

  test("q205 fully concentrated groups: hand-computed EMD 0.5, flagged") {
    val out = tclose(
      Seq.fill(4)(("g1", "S", "x")) ++ Seq.fill(4)(("g2", "S", "y")))
    assert(out(("g1", "S")) == ((4L, 0.5, true)))
    assert(out(("g2", "S")) == ((4L, 0.5, true)))
  }

  test("q205 absent sensitive values contribute via the complement term") {
    // g1 = {3x, 1y}, g2 = {4z}; global = (3/8, 1/8, 4/8)
    // TV(g1) = ((3/4-3/8) + (1/4-1/8) + (1/2-0)) / 2 = 0.5; TV(g2) = 0.5
    val out = tclose(
      Seq(("g1", "S", "x"), ("g1", "S", "x"), ("g1", "S", "x"), ("g1", "S", "y")) ++
        Seq.fill(4)(("g2", "S", "z")))
    assert(out(("g1", "S")) == ((4L, 0.5, true)))
    assert(out(("g2", "S")) == ((4L, 0.5, true)))
  }

  test("q205 EMD exactly at t = 0.25 is NOT flagged (strict decimal compare)") {
    // g1 = {2x, 2y}, g2 = {4y}; global = (1/4, 3/4)
    // TV(g1) = (|1/2-1/4| + |1/2-3/4|) / 2 = 1/4 exactly; TV(g2) = 1/4 too
    val out = tclose(
      Seq(("g1", "S", "x"), ("g1", "S", "x"), ("g1", "S", "y"), ("g1", "S", "y")) ++
        Seq.fill(4)(("g2", "S", "y")))
    assert(out(("g1", "S")) == ((4L, 0.25, false)))
    assert(out(("g2", "S")) == ((4L, 0.25, false)))
  }
}
