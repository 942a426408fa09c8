package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q176: BITMAP SET ALGEBRA retention — month-over-month retained /
  * new / churned customer counts computed ENTIRELY from the mergeable
  * bitmap partials q162 introduced, never from a row-level self-join.
  * This is the incremental-pipeline spelling of retention: a warehouse
  * that stores each month's (bucket, bitmap) partials (4 KB fixed
  * state per bucket, q96 discipline) answers "how many of last
  * month's actives came back?" by bitmap algebra alone — no re-scan
  * of either month's facts. The row-join spelling (q158's cohort
  * triangle, q169's flow ledger) re-shuffles user-grain rows every
  * refresh; this shuffles only months×buckets bitmap rows.
  *
  * Intersection without a bitmap AND: Spark ships `bitmap_or_agg`
  * but no intersection aggregate, so retained comes from exact
  * INCLUSION–EXCLUSION — |A∩B| = |A| + |B| − |A∪B| — where |A∪B|
  * is one `bitmap_or_agg` over the two months' partials per bucket.
  * Buckets partition the keyspace (no key spans buckets, q162), so
  * summing per-bucket counts is exact; every quantity is an exact
  * integer and the identities new = cur − retained,
  * churned = prev − retained hold by construction.
  *
  * Scale shape: ONE distinct (month, customer) exchange collapses the
  * fact; the partial build is a map-side-combined (month, bucket)
  * aggregate with fixed-size state; each partial then contributes to
  * at most TWO adjacent-pair unions (a 2× explode of the bounded
  * partial frame, not of rows), and everything downstream is
  * months-sized. Month keys are integers (y·12+m) so pair adjacency
  * is integer arithmetic on both engines.
  */
object BitmapAlgebra {

  /** Adjacent-period retention over `(periodCol, keyCol)` presence
    * via bitmap inclusion–exclusion. Emits one row per period that
    * has a predecessor. Factored so the spec can pin hand-built
    * membership (exact retained/new/churned), a bucket-boundary key
    * straddle, and the inclusion–exclusion identity.
    */
  def retention(df: DataFrame, periodCol: String, keyCol: String): DataFrame = {
    val partials = graft.CacheScope.trackedCache(
      df
        .select(col(periodCol).as("graft_p"),
          expr(s"bitmap_bucket_number($keyCol)").as("graft_bucket"),
          expr(s"bitmap_bit_position($keyCol)").as("graft_pos"))
        .groupBy(col("graft_p"), col("graft_bucket"))
        .agg(expr("bitmap_construct_agg(graft_pos)").as("graft_bm")))
    val actives = partials
      .groupBy(col("graft_p"))
      .agg(sum(expr("bitmap_count(graft_bm)")).as("graft_n"))
    // each pair key is its CURRENT month; a month's partials feed the
    // pair where it is the previous member and the one where it is
    // the current member
    val unions = partials.select((col("graft_p") + 1).as("graft_pair"), col("graft_bucket"), col("graft_bm"))
      .unionAll(partials.select(col("graft_p").as("graft_pair"), col("graft_bucket"), col("graft_bm")))
      .groupBy(col("graft_pair"), col("graft_bucket"))
      .agg(expr("bitmap_or_agg(graft_bm)").as("graft_u"))
      .groupBy(col("graft_pair"))
      .agg(sum(expr("bitmap_count(graft_u)")).as("graft_un"))
    actives.as("cur")
      .join(actives.select((col("graft_p") + 1).as("graft_p"), col("graft_n").as("graft_prev_n")), Seq("graft_p"))
      .join(unions, col("graft_p") === col("graft_pair"))
      .select(
        col("graft_p").as("month_key"),
        col("graft_n").as("n_active"),
        (col("graft_prev_n") + col("graft_n") - col("graft_un")).as("retained"),
        (col("graft_n") - (col("graft_prev_n") + col("graft_n") - col("graft_un"))).as("new_actives"),
        (col("graft_prev_n") - (col("graft_prev_n") + col("graft_n") - col("graft_un"))).as("churned"))
  }

  val q176 = Q.of(
    "q176_bitmap_retention",
    """WITH p AS (
      |  SELECT DISTINCT year(o_orderdate) * 12 + month(o_orderdate) AS mk,
      |    o_custkey AS c
      |  FROM orders
      |), m AS (
      |  SELECT mk, COUNT(*) AS n FROM p GROUP BY mk
      |), r AS (
      |  SELECT b.mk AS mk, COUNT(*) AS retained
      |  FROM p a JOIN p b ON a.c = b.c AND b.mk = a.mk + 1
      |  GROUP BY b.mk
      |)
      |SELECT CAST(cur.mk AS BIGINT) AS month_key,
      |  CAST(cur.n AS BIGINT) AS n_active,
      |  CAST(COALESCE(r.retained, 0) AS BIGINT) AS retained,
      |  CAST(cur.n - COALESCE(r.retained, 0) AS BIGINT) AS new_actives,
      |  CAST(prev.n - COALESCE(r.retained, 0) AS BIGINT) AS churned
      |FROM m cur
      |JOIN m prev ON cur.mk = prev.mk + 1
      |LEFT JOIN r ON r.mk = cur.mk
      |ORDER BY month_key""".stripMargin) { t =>
    retention(
      t.orders.select(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mk"),
        col("o_custkey")),
      "mk", "o_custkey")
      .orderBy(col("month_key"))
  }

  def all: Seq[Q] = Seq(q176)
}
