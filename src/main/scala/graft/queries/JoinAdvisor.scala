package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

import graft.Q

/** q212: JOIN-ORDER ADVISOR — Selinger-style cost comparison
  * (Selinger et al. 1979, public) computed from EXACT key histograms,
  * as a query: for the filtered chain
  * σ(orders) ⋈ σ(lineitem) ⋈ σ(part), the exact first-intermediate
  * cardinality of each left-deep order (|σO ⋈ σL| via orderkey,
  * |σL ⋈ σP| via partkey, and the avoided cross product |σO|·|σP|),
  * the shared final cardinality, and the argmin choice. q196 measures
  * per-key SKEW (when to salt); this measures JOIN ORDER (what to
  * join first) — together they are the optimizer-statistics surface
  * an engine consults before every shuffle plan.
  *
  * The join sizes are EXACT, not estimates: |A ⋈_k B| = Σ_k c_A(k)·
  * c_B(k) folded from per-key count cells (the bilinear cross-table
  * version of q196's Σc² — the joins below ship COUNT CELLS, never
  * data rows). The 3-way count reuses the per-lineitem-key cells with
  * both membership joins on projected keys only. All arithmetic is
  * int64 products summed into DECIMAL(38,0) — hash-exact by
  * construction; the chosen flag is an integer argmin with a
  * deterministic name tiebreak.
  *
  * Scale shape: three filtered key-projection scans (columns pruned
  * to key + predicate), per-key map-side-combined counts, cell-grain
  * joins, 3 rows out. The advisor costs a vanishing fraction of the
  * joins it advises on — exactly the economics real optimizers bank.
  */
object JoinAdvisor {

  private val D38 = DataTypes.createDecimalType(38, 0)

  /** Exact |A ⋈ B| on `key` from two pre-filtered frames. */
  def joinSize(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column): DataFrame = {
    val ca = a.groupBy(aKey.as("k")).agg(count(lit(1)).as("graft_ca"))
    val cb = b.groupBy(bKey.as("k")).agg(count(lit(1)).as("graft_cb"))
    ca.join(cb, Seq("k"))
      .agg(coalesce(sum((col("graft_ca") * col("graft_cb")).cast(D38)),
        lit(0).cast(D38)).cast("long").as("rows"))
  }

  val q212 = Q.of(
    "q212_join_advisor",
    """WITH so AS (
      |  SELECT o_orderkey AS ok FROM orders
      |  WHERE o_orderpriority = '1-URGENT'
      |), sl AS (
      |  SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |  WHERE l_quantity > 45
      |), sp AS (
      |  SELECT p_partkey AS pk FROM part WHERE p_size < 10
      |), co AS (SELECT ok, COUNT(*) AS c FROM so GROUP BY 1),
      |cl_ok AS (SELECT ok, COUNT(*) AS c FROM sl GROUP BY 1),
      |cl_pk AS (SELECT pk, COUNT(*) AS c FROM sl GROUP BY 1),
      |cp AS (SELECT pk, COUNT(*) AS c FROM sp GROUP BY 1),
      |sz_ol AS (
      |  SELECT COALESCE(CAST(SUM(CAST(co.c * cl_ok.c AS DECIMAL(38,0)))
      |    AS BIGINT), 0) AS rows
      |  FROM co JOIN cl_ok ON co.ok = cl_ok.ok
      |), sz_lp AS (
      |  SELECT COALESCE(CAST(SUM(CAST(cl_pk.c * cp.c AS DECIMAL(38,0)))
      |    AS BIGINT), 0) AS rows
      |  FROM cl_pk JOIN cp ON cl_pk.pk = cp.pk
      |), sz_cross AS (
      |  SELECT (SELECT COUNT(*) FROM so) * (SELECT COUNT(*) FROM sp) AS rows
      |), fin AS (
      |  SELECT COUNT(*) AS rows
      |  FROM sl
      |  JOIN so ON sl.ok = so.ok
      |  JOIN sp ON sl.pk = sp.pk
      |), plans AS (
      |  SELECT 'orders_lineitem_first' AS plan,
      |    (SELECT rows FROM sz_ol) AS first_intermediate, FALSE AS is_cross
      |  UNION ALL
      |  SELECT 'lineitem_part_first',
      |    (SELECT rows FROM sz_lp), FALSE
      |  UNION ALL
      |  SELECT 'orders_part_cross',
      |    (SELECT rows FROM sz_cross), TRUE
      |)
      |SELECT plan,
      |  CAST(first_intermediate AS BIGINT) AS first_intermediate,
      |  CAST((SELECT rows FROM fin) AS BIGINT) AS final_rows,
      |  is_cross,
      |  NOT is_cross AND plan = (
      |    SELECT plan FROM plans WHERE NOT is_cross
      |    ORDER BY first_intermediate, plan LIMIT 1)
      |    AS chosen
      |FROM plans
      |ORDER BY plan""".stripMargin) { t =>
    val so = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("ok"))
    val sl = t.lineitem.filter(col("l_quantity") > 45)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val sp = t.part.filter(col("p_size") < 10)
      .select(col("p_partkey").as("pk"))

    val szOl = joinSize(so, col("ok"), sl, col("ok"))
      .select(lit("orders_lineitem_first").as("plan"),
        col("rows").as("first_intermediate"), lit(false).as("is_cross"))
    val szLp = joinSize(sl, col("pk"), sp, col("pk"))
      .select(lit("lineitem_part_first").as("plan"),
        col("rows").as("first_intermediate"), lit(false).as("is_cross"))
    val szCross = so.agg(count(lit(1)).as("graft_no"))
      .join(sp.agg(count(lit(1)).as("graft_np")))
      .select(lit("orders_part_cross").as("plan"),
        (col("graft_no") * col("graft_np")).as("first_intermediate"),
        lit(true).as("is_cross"))

    val fin = sl
      .join(so, Seq("ok"))
      .join(sp, Seq("pk"))
      .agg(count(lit(1)).as("final_rows"))

    val plans = szOl.unionAll(szLp).unionAll(szCross)
    // argmin over (first_intermediate, plan): min of a 2-field struct
    // orders lexicographically, so two plans tied on cardinality
    // resolve to exactly one chosen row by plan name — the documented
    // deterministic name tiebreak, mirrored by the oracle's
    // ORDER BY first_intermediate, plan LIMIT 1 scalar subquery.
    val best = plans.filter(!col("is_cross"))
      .agg(min(struct(col("first_intermediate"), col("plan"))).as("graft_best"))
    plans
      .join(broadcast(fin))
      .join(broadcast(best))
      .select(col("plan"), col("first_intermediate"), col("final_rows"),
        col("is_cross"),
        (!col("is_cross") &&
          col("plan") === col("graft_best.plan")).as("chosen"))
      .orderBy(col("plan"))
  }

  def all: Seq[Q] = Seq(q212)
}
