package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q224: TIE-CORRECTED SPEARMAN rank correlation per segment — the
  * rank-based member of the correlation tier (q11 Pearson measures
  * linear association and is outlier-fragile; q153 Theil–Sen fits a
  * robust trend; Spearman's ρ measures MONOTONE association, the
  * question "do bigger orders come from richer customers AT ALL, in
  * any shape" — the standard first screen before fitting anything).
  *
  * Exactness: tie-corrected Spearman IS Pearson over average ranks,
  * and twice the average rank is an INTEGER — 2·r̄ = 2·rank + ties − 1
  * (rank() gives the tie-group's first position, COUNT(*) OVER the
  * tie-group its size) — while Pearson is invariant to the affine
  * ×2, so the whole rank side is exact int64 and the moment sums are
  * exact decimals. The final ρ is one fixed IEEE chain over
  * VARCHAR-bounced casts (§6(k): at sf1 the Σr² moments exceed 2⁵³
  * scaled units, exactly the case the bounce rule exists for).
  *
  * Scale shape: one orders⋈customer join (AQE broadcasts the dim),
  * two rank windows per segment key — partition-parallel, never a
  * global window — and a 5-row moment rollup. Ranks are the only
  * addition over q11's plan.
  */
object Spearman {

  val q224 = Q.of(
    "q224_spearman",
    """WITH j AS (
      |  SELECT o_orderpriority AS key, o_totalprice AS x, c_acctbal AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |), r AS (
      |  SELECT key,
      |    2 * rank() OVER (PARTITION BY key ORDER BY x)
      |      + COUNT(*) OVER (PARTITION BY key, x) - 1 AS rx,
      |    2 * rank() OVER (PARTITION BY key ORDER BY y)
      |      + COUNT(*) OVER (PARTITION BY key, y) - 1 AS ry
      |  FROM j
      |), m AS (
      |  SELECT key, COUNT(*) AS n,
      |    CAST(CAST(SUM(CAST(rx AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(ry AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(rx * rx AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(rx * ry AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sxy,
      |    CAST(CAST(SUM(CAST(ry * ry AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS syy
      |  FROM r GROUP BY key
      |)
      |SELECT key, n,
      |  CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
      |        AND CAST(n AS DOUBLE) * syy - sy * sy > 0.0
      |    THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
      |       / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
      |          * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) END AS rho
      |FROM m
      |ORDER BY key""".stripMargin) { t =>
    val j = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderpriority").as("key"),
        col("o_totalprice").as("x"), col("c_acctbal").as("y"))
    val wx = Window.partitionBy(col("key")).orderBy(col("x"))
    val wy = Window.partitionBy(col("key")).orderBy(col("y"))
    val r = j.select(col("key"),
      (lit(2L) * rank().over(wx)
        + count(lit(1)).over(Window.partitionBy(col("key"), col("x"))) - 1L)
        .as("rx"),
      (lit(2L) * rank().over(wy)
        + count(lit(1)).over(Window.partitionBy(col("key"), col("y"))) - 1L)
        .as("ry"))
    def bounced(c: org.apache.spark.sql.Column) =
      sum(c.cast(graft.functions.det.D28_6)).cast("double")
    val m = r.groupBy(col("key")).agg(
      count(lit(1)).as("n"),
      bounced(col("rx")).as("sx"),
      bounced(col("ry")).as("sy"),
      bounced(col("rx") * col("rx")).as("sxx"),
      bounced(col("rx") * col("ry")).as("sxy"),
      bounced(col("ry") * col("ry")).as("syy"))
    val nd = col("n").cast("double")
    val dx = nd * col("sxx") - col("sx") * col("sx")
    val dy = nd * col("syy") - col("sy") * col("sy")
    m.select(col("key"), col("n"),
        when(dx > 0.0 && dy > 0.0,
          (nd * col("sxy") - col("sx") * col("sy")) / (sqrt(dx) * sqrt(dy)))
          .as("rho"))
      .orderBy(col("key"))
  }

  def all: Seq[Q] = Seq(q224)
}
