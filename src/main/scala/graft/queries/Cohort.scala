package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{AsOf, Q}
import graft.Dims.dimBroadcast
import graft.functions.det._

/** q59: the tenth full reference analysis end-to-end — Content
  * Performance with Cohort Analysis (/root/reference/SQL/Content
  * Performance with Cohort Analysis.txt:1-17; pyspark twin) as one
  * oracle-checked composition: content cohorts by catalog-add month →
  * initial-window (days 0–30) viewers and completion → long-term
  * window (days 31–90) viewers → retained viewers (the reference's
  * correlated `profile_id IN (initial viewers)` subquery) → retention
  * rate → per-(cohort, genre, type) rollup with retention ladders and
  * HAVING ≥ 5.
  *
  * Reference → testdata mapping (SURVEY §3): content→part
  * (genre→brand family, content_type→first word of p_type),
  * profile→l_suppkey, start_time→l_shipdate,
  * completion→(1−l_discount)·100 (q49's mapping), and
  * content.added_date→the content's FIRST stream (`min(l_shipdate)`
  * per part) — data-derived, so the cohort month exists at every SF
  * without inventing a date column. The reference's fixed
  * `added_date >= '2023-01-01'` filter is asOf-parameterized
  * (added ∈ (asOf − lookback, asOf]).
  *
  * Re-designs vs the reference (noted per VERDICT r2 policy):
  * the reference's three correlated per-content subqueries (initial
  * viewers, initial completion, long-term + retained viewers) fuse
  * into ONE per-(content, viewer) conditional aggregate followed by a
  * per-content roll-up — the `IN (initial viewers)` membership test
  * becomes a flag conjunction on the per-viewer row, so the fact is
  * never self-joined. The reference SQL's count-subquery yields 0 (not
  * NULL) for contents with no long-term viewers, so long-term counts
  * average 0s in (the pyspark twin's LEFT-JOIN/avg-skips-nulls variant
  * disagrees with its own SQL; we follow the SQL). Cell-level averages
  * of per-content ratios (retention, completion) are exact left-fold
  * sums over sorted arrays (the q58 rule: dsum's double→decimal cast
  * can half-tie); averages of integer counts are exact BIGINT sums
  * cast to double.
  *
  * Plan shape at scale: ONE fact scan (shipdate ≤ asOf pushed) → ONE
  * exchange on l_partkey that is reused three times — the
  * catalog-add-date window min, the (content, viewer) aggregate, and
  * the per-content aggregate all require only l_partkey clustering
  * (hash(l_partkey) satisfies every ClusteredDistribution here, so
  * EnsureRequirements inserts no further fact exchange; pinned in
  * RelationalSpec) → part dim broadcast onto the |parts|-sized frame →
  * the (cohort, genre, type) rollup and its sorted-array state scale
  * with contents per cell (a dim, not the fact).
  */
object Cohort {

  val defaultAsOf: AsOf = AsOf("1996-12-31")
  val defaultLookbackDays = 731

  def q59For(asOf: AsOf, lookbackDays: Int): Q = {
    val cohortStart = asOf.minusDays(lookbackDays)

    Q.of(
      "q59_cohort_performance",
      s"""WITH f AS (
        |  SELECT l_partkey, l_suppkey, l_shipdate,
        |    (1.0 - l_discount) * 100 AS completion,
        |    min(l_shipdate) OVER (PARTITION BY l_partkey) AS added
        |  FROM lineitem WHERE l_shipdate <= ${asOf.sqlTs}
        |), w AS (
        |  SELECT *, CAST(CAST(l_shipdate AS DATE) - CAST(added AS DATE) AS BIGINT) AS days
        |  FROM f WHERE added >= ${cohortStart.sqlTs}
        |), pv AS (
        |  SELECT l_partkey, l_suppkey, max(added) AS added,
        |    count(CASE WHEN days <= 30 THEN 1 END) AS iv,
        |    count(CASE WHEN days BETWEEN 31 AND 90 THEN 1 END) AS lv,
        |    SUM(CASE WHEN days <= 30 THEN CAST(completion AS DECIMAL(20,6)) END) AS ic_sum
        |  FROM w GROUP BY 1, 2
        |), cm AS (
        |  SELECT l_partkey, max(added) AS added,
        |    count(CASE WHEN iv > 0 THEN 1 END) AS initial_viewers,
        |    count(CASE WHEN lv > 0 THEN 1 END) AS long_term_viewers,
        |    count(CASE WHEN iv > 0 AND lv > 0 THEN 1 END) AS retained_viewers,
        |    CAST(SUM(ic_sum) AS DOUBLE) / CAST(CAST(SUM(iv) AS BIGINT) AS DOUBLE) AS initial_completion_rate
        |  FROM pv GROUP BY 1
        |), cr AS (
        |  SELECT strftime(CAST(added AS DATE), '%Y-%m') AS content_cohort,
        |    substr(p_brand, 1, 7) AS genre, split_part(p_type, ' ', 1) AS content_type,
        |    initial_viewers, long_term_viewers, initial_completion_rate,
        |    CASE WHEN initial_viewers > 0
        |      THEN CAST(retained_viewers AS DOUBLE) / CAST(initial_viewers AS DOUBLE) * 100
        |      ELSE CAST(0 AS DOUBLE) END AS viewer_retention_rate
        |  FROM cm JOIN part ON p_partkey = l_partkey
        |)
        |SELECT content_cohort, genre, content_type,
        |  count(*) AS content_count,
        |  CAST(CAST(SUM(initial_viewers) AS BIGINT) AS DOUBLE) / count(*) AS avg_initial_viewers,
        |  CAST(CAST(SUM(long_term_viewers) AS BIGINT) AS DOUBLE) / count(*) AS avg_long_term_viewers,
        |  list_reduce(list_sort(list(viewer_retention_rate)), (a, b) -> a + b)
        |    / CAST(count(*) AS DOUBLE) AS avg_retention_rate,
        |  list_reduce(list_sort(list(initial_completion_rate)), (a, b) -> a + b)
        |    / CAST(count(*) AS DOUBLE) AS avg_initial_completion,
        |  count(CASE WHEN viewer_retention_rate > 50 THEN 1 END) AS high_retention_content,
        |  count(CASE WHEN viewer_retention_rate BETWEEN 20 AND 50 THEN 1 END) AS medium_retention_content,
        |  count(CASE WHEN viewer_retention_rate < 20 THEN 1 END) AS low_retention_content
        |FROM cr GROUP BY 1, 2, 3 HAVING count(*) >= 5
        |ORDER BY content_cohort, avg_retention_rate DESC, genre, content_type""".stripMargin) { t =>
      val byContent = Window.partitionBy(col("l_partkey"))

      val f = t.lineitem
        .filter(col("l_shipdate") <= asOf.tsLit)
        .select(col("l_partkey"), col("l_suppkey"), col("l_shipdate"),
          ((lit(1.0) - col("l_discount")) * 100).as("completion"))
        .withColumn("added", min(col("l_shipdate")).over(byContent))
        .filter(col("added") >= cohortStart.tsLit)
        .withColumn("days", datediff(col("l_shipdate"), col("added")))

      // per-(content, viewer): window-membership flags + completion
      // partials; the first stream is day 0, so iv >= 1 for at least
      // one viewer of every content (the completion divisor below is
      // never zero)
      val pv = f.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(
          max(col("added")).as("added"),
          count(when(col("days") <= 30, lit(1))).as("iv"),
          count(when(col("days").between(31, 90), lit(1))).as("lv"),
          sum(when(col("days") <= 30, col("completion").cast(D20_6))).as("ic_sum"))

      val cm = pv.groupBy(col("l_partkey"))
        .agg(
          max(col("added")).as("added"),
          count(when(col("iv") > 0, lit(1))).as("initial_viewers"),
          count(when(col("lv") > 0, lit(1))).as("long_term_viewers"),
          count(when(col("iv") > 0 && col("lv") > 0, lit(1))).as("retained_viewers"),
          (sum(col("ic_sum")).cast("double") / sum(col("iv")).cast("double"))
            .as("initial_completion_rate"))

      val cr = cm
        .join(dimBroadcast(t.part.select(col("p_partkey"),
          substring(col("p_brand"), 1, 7).as("genre"),
          split(col("p_type"), " ").getItem(0).as("content_type"))),
          col("p_partkey") === col("l_partkey"))
        .withColumn("content_cohort", date_format(col("added"), "yyyy-MM"))
        .withColumn("viewer_retention_rate",
          when(col("initial_viewers") > 0,
            col("retained_viewers").cast("double") /
              col("initial_viewers").cast("double") * 100)
            .otherwise(lit(0).cast("double")))

      cr.groupBy(col("content_cohort"), col("genre"), col("content_type"))
        .agg(
          count(lit(1)).as("content_count"),
          (sum(col("initial_viewers")).cast("double") / count(lit(1)))
            .as("avg_initial_viewers"),
          (sum(col("long_term_viewers")).cast("double") / count(lit(1)))
            .as("avg_long_term_viewers"),
          sort_array(collect_list(col("viewer_retention_rate"))).as("rr_arr"),
          sort_array(collect_list(col("initial_completion_rate"))).as("ic_arr"),
          count(when(col("viewer_retention_rate") > 50, lit(1)))
            .as("high_retention_content"),
          count(when(col("viewer_retention_rate").between(20, 50), lit(1)))
            .as("medium_retention_content"),
          count(when(col("viewer_retention_rate") < 20, lit(1)))
            .as("low_retention_content"))
        .filter(col("content_count") >= 5)
        .withColumn("avg_retention_rate",
          aggregate(col("rr_arr"), lit(0.0), (a, x) => a + x) /
            col("content_count").cast("double"))
        .withColumn("avg_initial_completion",
          aggregate(col("ic_arr"), lit(0.0), (a, x) => a + x) /
            col("content_count").cast("double"))
        .drop("rr_arr", "ic_arr")
        .select(col("content_cohort"), col("genre"), col("content_type"),
          col("content_count"), col("avg_initial_viewers"),
          col("avg_long_term_viewers"), col("avg_retention_rate"),
          col("avg_initial_completion"), col("high_retention_content"),
          col("medium_retention_content"), col("low_retention_content"))
        .orderBy(col("content_cohort"), col("avg_retention_rate").desc,
          col("genre"), col("content_type"))
    }
  }

  val q59: Q = q59For(defaultAsOf, defaultLookbackDays)

  def all: Seq[Q] = Seq(q59)
}
