package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** q181: DIFFERENCE-IN-DIFFERENCES estimator — per market segment,
  * the 2×2 (treated × pre/post) cell means of order value and
  * DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre): the
  * quasi-experimental effect estimate that subtracts the secular
  * trend a naive post-vs-pre or treated-vs-control comparison
  * conflates (Card & Krueger 1994 canon, public). Completes the
  * causal-readout ladder: q74 reads a randomized A/B, q165/q171/q172
  * test association and distribution shift; DiD is what remains when
  * assignment is NOT randomized but a parallel-trend control exists.
  *
  * Deterministic devices (q74 precedent): treatment = o_custkey % 2
  * (the reference's own `% 3` group-assignment device), post =
  * orders on/after the fixed 1998-07-01 split (the corpus midpoint);
  * the metric is floor-dollar order value (q177's integer
  * granularity) so every cell sum is an exact int64.
  *
  * Scale shape: ONE pruned orders scan, ONE map-side-combined
  * (segment) aggregate carrying eight conditional integers — the 2×2
  * cells as constant-size state, never a row-level pivot or a
  * cell-wise self-join; the customer dim joins BROADCAST for the
  * segment label before the aggregate (at 100 TB: an 8-byte
  * o_custkey exchange, q03 class). Cell means and DiD are IEEE
  * divisions/subtractions of exact integers in the IDENTICAL token
  * order both engines (§6 round-4 rule); any empty cell nulls the
  * estimate rather than fabricating a 0-mean arm.
  */
object Did {

  private val SplitDate = "1998-07-01"

  /** 2×2 DiD per group of `groupCol`, cells defined by boolean
    * columns `treatedCol`/`postCol` over integer metric `vCol`.
    * Factored so the spec can pin a hand-computed panel, the
    * trend-cancellation identity (pure parallel trend ⇒ did = 0),
    * and the empty-cell NULL guard.
    */
  def did(df: DataFrame, groupCol: String, treatedCol: Column,
      postCol: Column, vCol: Column): DataFrame = {
    def cell(t: Boolean, p: Boolean): (Column, Column) = {
      val in = (if (t) treatedCol else !treatedCol) &&
        (if (p) postCol else !postCol)
      (count(when(in, lit(1))),
        sum(when(in, vCol)))
    }
    // exact int64 cell sums; each mean is ONE IEEE division of the
    // exact sum — identical token order in the oracle (§6 round 4)
    def mean(c: String): Column =
      col(s"graft_s_$c").cast("double") / col(s"n_$c")
    val (ntPre, stPre) = cell(t = true, p = false)
    val (ntPost, stPost) = cell(t = true, p = true)
    val (ncPre, scPre) = cell(t = false, p = false)
    val (ncPost, scPost) = cell(t = false, p = true)
    df.groupBy(col(groupCol))
      .agg(
        ntPre.as("n_t_pre"), stPre.as("graft_s_t_pre"),
        ntPost.as("n_t_post"), stPost.as("graft_s_t_post"),
        ncPre.as("n_c_pre"), scPre.as("graft_s_c_pre"),
        ncPost.as("n_c_post"), scPost.as("graft_s_c_post"))
      .select(
        col(groupCol),
        col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        mean("t_pre").as("avg_t_pre"),
        mean("t_post").as("avg_t_post"),
        mean("c_pre").as("avg_c_pre"),
        mean("c_post").as("avg_c_post"),
        ((mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre")))
          .as("did"))
  }

  val q181 = Q.of(
    "q181_did_estimator",
    s"""WITH o AS (
      |  SELECT c_mktsegment AS segment,
      |    o_custkey % 2 = 1 AS treated,
      |    o_orderdate >= TIMESTAMP '$SplitDate 00:00:00' AS post,
      |    CAST(FLOOR(o_totalprice) AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |), cells AS (
      |  SELECT segment,
      |    COUNT(CASE WHEN treated AND NOT post THEN 1 END) AS n_t_pre,
      |    SUM(CASE WHEN treated AND NOT post THEN v END) AS s_t_pre,
      |    COUNT(CASE WHEN treated AND post THEN 1 END) AS n_t_post,
      |    SUM(CASE WHEN treated AND post THEN v END) AS s_t_post,
      |    COUNT(CASE WHEN NOT treated AND NOT post THEN 1 END) AS n_c_pre,
      |    SUM(CASE WHEN NOT treated AND NOT post THEN v END) AS s_c_pre,
      |    COUNT(CASE WHEN NOT treated AND post THEN 1 END) AS n_c_post,
      |    SUM(CASE WHEN NOT treated AND post THEN v END) AS s_c_post
      |  FROM o GROUP BY segment
      |)
      |SELECT segment,
      |  CAST(n_t_pre AS BIGINT) AS n_t_pre,
      |  CAST(n_t_post AS BIGINT) AS n_t_post,
      |  CAST(n_c_pre AS BIGINT) AS n_c_pre,
      |  CAST(n_c_post AS BIGINT) AS n_c_post,
      |  CAST(s_t_pre AS DOUBLE) / n_t_pre AS avg_t_pre,
      |  CAST(s_t_post AS DOUBLE) / n_t_post AS avg_t_post,
      |  CAST(s_c_pre AS DOUBLE) / n_c_pre AS avg_c_pre,
      |  CAST(s_c_post AS DOUBLE) / n_c_post AS avg_c_post,
      |  (CAST(s_t_post AS DOUBLE) / n_t_post - CAST(s_t_pre AS DOUBLE) / n_t_pre)
      |    - (CAST(s_c_post AS DOUBLE) / n_c_post - CAST(s_c_pre AS DOUBLE) / n_c_pre) AS did
      |FROM cells
      |ORDER BY segment""".stripMargin) { t =>
    did(
      t.orders
        .join(broadcast(t.customer.select(col("c_custkey"),
          col("c_mktsegment").as("segment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("segment"),
          (col("o_custkey") % 2 === 1).as("graft_treated"),
          (col("o_orderdate") >= to_timestamp(lit(s"$SplitDate 00:00:00")))
            .as("graft_post"),
          floor(col("o_totalprice")).cast("long").as("graft_v")),
      "segment", col("graft_treated"), col("graft_post"), col("graft_v"))
      .orderBy(col("segment"))
  }

  def all: Seq[Q] = Seq(q181)
}
