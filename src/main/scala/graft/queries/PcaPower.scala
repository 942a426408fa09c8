package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q208: PRINCIPAL COMPONENT by deterministic POWER ITERATION — the
  * unsupervised feature-extraction primitive (Pearson 1901; power
  * method, von Mises 1929 — both public): the dominant eigenvector of
  * the CORRELATION matrix of the fact's numeric measures, its
  * eigenvalue (Rayleigh quotient), and the explained-variance share.
  * q11/q130 fit SUPERVISED lines; this finds the direction the data
  * varies most — the readout behind whitening, embedding compression
  * (q53/q88 quantizers), and collinearity audits.
  *
  * Determinism (the q118 fixed-point doctrine, carried to IEEE):
  * the moment sums n, Σxᵢ, Σxᵢ², Σxᵢxⱼ are exact D28_6 decimals
  * (order-independent); every correlation r_ij is det.dcorr's FIXED
  * IEEE chain over those exact operands; the T = 12 unrolled power
  * steps (w = R·v; v = w/√Σw² — IEEE sqrt is correctly rounded, so
  * it is cross-engine exact) are the SAME expression tree in the
  * oracle, so the eigenvector is bit-identical with NO rounding
  * anywhere. v₀ = (½,½,½,½) and the iteration count are part of the
  * contract; the sign convention follows from the positive start.
  *
  * Scale shape: ONE fact scan folds to a single 15-number moment row
  * (map-side combined — nothing but that row crosses the exchange);
  * the 4×4 eigen-iteration is a fixed one-row expression chain, free
  * at any corpus size. Headroom: Σx² of 1e5-scale values holds to
  * ~1e12 rows in D28_6's 22 integer digits; D38 is the escape hatch.
  */
object PcaPower {

  private val Iters = 12

  /** Moment columns + correlation chain + unrolled power iteration
    * over the four given feature columns. Factored so the spec can
    * pin a hand-built covariance structure (a dominant axis in 2D
    * recovers the known eigenvector; an identity correlation keeps
    * v = v₀ and λ = 1).
    */
  def pca4(df: DataFrame, x1: Column, x2: Column, x3: Column, x4: Column,
      iters: Int = Iters): DataFrame = {
    val xs = Seq(x1, x2, x3, x4)
    val momAggs =
      Seq(count(lit(1)).as("n")) ++
        xs.zipWithIndex.map { case (x, i) => det.dsumw(x).as(s"s${i + 1}") } ++
        (for (i <- 0 until 4; j <- i until 4) yield
          det.dsumw(xs(i) * xs(j)).as(s"s${i + 1}${j + 1}"))
    val m = df.agg(momAggs.head, momAggs.tail: _*)
    val nD = col("n").cast("double")
    def r(i: Int, j: Int): Column =
      if (i == j) lit(1.0)
      else {
        val (a, b) = if (i < j) (i, j) else (j, i)
        (nD * col(s"s$a$b") - col(s"s$a") * col(s"s$b")) /
          (sqrt(nD * col(s"s$a$a") - col(s"s$a") * col(s"s$a")) *
            sqrt(nD * col(s"s$b$b") - col(s"s$b") * col(s"s$b")))
      }
    val withR = m.select(
      (col("n") +: (for (i <- 1 to 4; j <- i + 1 to 4)
        yield r(i, j).as(s"r$i$j"))): _*)
    val rCols: Seq[Column] =
      for (i <- 1 to 4; j <- i + 1 to 4) yield col(s"r$i$j")
    val v0 = withR.select(
      (Seq(col("n")) ++ rCols ++
        Seq(lit(0.5).as("v1"), lit(0.5).as("v2"),
          lit(0.5).as("v3"), lit(0.5).as("v4"))): _*)
    def rr(i: Int, j: Int): Column =
      if (i == j) lit(1.0) else if (i < j) col(s"r$i$j") else col(s"r$j$i")
    val iterated = (1 to iters).foldLeft(v0) { (cur, _) =>
      val w = cur.select(
        (Seq(col("n")) ++ rCols ++
          (1 to 4).map(i =>
            (rr(i, 1) * col("v1") + rr(i, 2) * col("v2")
              + rr(i, 3) * col("v3") + rr(i, 4) * col("v4")).as(s"w$i"))): _*)
      val nrm = sqrt(col("w1") * col("w1") + col("w2") * col("w2")
        + col("w3") * col("w3") + col("w4") * col("w4"))
      w.select(
        (Seq(col("n")) ++ rCols ++
          (1 to 4).map(i => (col(s"w$i") / nrm).as(s"v$i"))): _*)
    }
    val lam = (1 to 4).map(i =>
      col(s"v$i") * (rr(i, 1) * col("v1") + rr(i, 2) * col("v2")
        + rr(i, 3) * col("v3") + rr(i, 4) * col("v4")))
      .reduce(_ + _)
    iterated.select(
      col("n"), col("v1"), col("v2"), col("v3"), col("v4"),
      lam.as("eigenvalue"),
      (lam / lit(4.0)).as("explained_share"))
  }

  /** DuckDB mirror of the identical expression chain, generated from
    * the same structure so the IEEE token sequence matches. */
  private def oracleSql(iters: Int): String = {
    val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val moments =
      // §6(k): the D28_6 moment sums feed the cancellation-sensitive
      // n·Sxy − Sx·Sy correlation chain, so the DECIMAL→DOUBLE cast is
      // bounced through VARCHAR — past 2^53 scaled units DuckDB's
      // double(v)/double(10^s) double-rounds while Spark rounds once.
      Seq("COUNT(*) AS n") ++
        feats.zipWithIndex.map { case (f, i) =>
          s"CAST(CAST(SUM(CAST($f AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS s${i + 1}" } ++
        (for (i <- 0 until 4; j <- i until 4) yield
          s"CAST(CAST(SUM(CAST(${feats(i)} * ${feats(j)} AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS s${i + 1}${j + 1}")
    def rExpr(a: Int, b: Int): String =
      s"(CAST(n AS DOUBLE) * s$a$b - s$a * s$b) / " +
        s"(SQRT(CAST(n AS DOUBLE) * s$a$a - s$a * s$a) * " +
        s"SQRT(CAST(n AS DOUBLE) * s$b$b - s$b * s$b))"
    val rCols = (for (i <- 1 to 4; j <- i + 1 to 4)
      yield s"${rExpr(i, j)} AS r$i$j").mkString(",\n    ")
    val rNames = (for (i <- 1 to 4; j <- i + 1 to 4) yield s"r$i$j").mkString(", ")
    def rr(i: Int, j: Int): String =
      if (i == j) "1.0" else if (i < j) s"r$i$j" else s"r$j$i"
    def wExpr(i: Int): String =
      s"${rr(i, 1)} * v1 + ${rr(i, 2)} * v2 + ${rr(i, 3)} * v3 + ${rr(i, 4)} * v4"
    val nrm = "SQRT(w1 * w1 + w2 * w2 + w3 * w3 + w4 * w4)"
    val iterCtes = (1 to iters).map { t =>
      s"""w$t AS (
         |  SELECT n, $rNames,
         |    ${(1 to 4).map(i => s"${wExpr(i)} AS w$i").mkString(",\n    ")}
         |  FROM it${t - 1}
         |), it$t AS (
         |  SELECT n, $rNames,
         |    ${(1 to 4).map(i => s"w$i / $nrm AS v$i").mkString(",\n    ")}
         |  FROM w$t
         |)""".stripMargin
    }.mkString(", ")
    val lam = (1 to 4).map(i => s"v$i * (${wExpr(i)})").mkString(" + ")
    s"""WITH m AS (
       |  SELECT ${moments.mkString(",\n    ")}
       |  FROM lineitem
       |), r AS (
       |  SELECT n,
       |    $rCols
       |  FROM m
       |), it0 AS (
       |  SELECT n, $rNames,
       |    0.5 AS v1, 0.5 AS v2, 0.5 AS v3, 0.5 AS v4
       |  FROM r
       |), $iterCtes
       |SELECT n, v1, v2, v3, v4,
       |  $lam AS eigenvalue,
       |  ($lam) / 4.0 AS explained_share
       |FROM it$iters""".stripMargin
  }

  val q208 = Q.of("q208_pca_power", oracleSql(Iters)) { t =>
    pca4(t.lineitem,
      col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"))
  }

  def all: Seq[Q] = Seq(q208)
}
