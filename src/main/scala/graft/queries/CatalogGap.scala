package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{AsOf, Q, Tables}
import graft.Dims.dimBroadcast
import graft.functions.det._
import graft.operators.TopK

/** q47: the third full reference analysis end-to-end — Content Catalog
  * Gap Analysis (/root/reference/SQL/Content Catalog Gap
  * Analysis.txt:1-150; pyspark twin) as one oracle-checked
  * composition: demand metrics over an asOf-windowed fact scan →
  * adjacent-window demand growth → catalog coverage with a
  * per-genre correlated-max (re-expressed as a window max) → literal
  * competitor VALUES relation → LEFT-JOIN gap metrics + priority
  * score → CASE ladders (priority / action / budget) → per-genre
  * top-actor GROUP_CONCAT (the reference's correlated LIMIT-3
  * subquery, re-expressed as a ranked aggregate joined back).
  *
  * Reference → testdata mapping (SURVEY §3): content→part
  * (genre→p_brand, content_type→p_type, maturity_rating→p_size
  * class, imdb_rating→(p_retailprice−900)/2 ≙ 0–10,
  * content age→p_size), viewing_history→lineitem (viewer→l_suppkey,
  * start_time→l_shipdate, completion→(1−l_discount)·100), the
  * watchlist→'R'-flagged lines, actors→supplier via the lineitem
  * bridge. The reference's 30/60/90-day windows become 365/730-day
  * windows (same `DATE_SUB(CURRENT_DATE, N)` idiom via [[graft.AsOf]];
  * the synthetic fact needs wider windows for per-cell density).
  *
  * Plan shape at scale: ONE lineitem scan with the 730-day window
  * pushed to parquet feeds the demand aggregate (single exchange on
  * the 3 cell keys); the part-only catalog aggregate and the
  * supplier ranking are dim-sized; competitor data is a literal local
  * relation; every join onto the cell frame is broadcast. The
  * reference's correlated `MAX(current_views) per genre` subquery is
  * a window max over the already-aggregated cell frame (no re-scan),
  * and its correlated GROUP_CONCAT LIMIT 3 is one ranked aggregate
  * computed once per genre instead of once per output row.
  *
  * Gap columns that can be NULL (cells without competitor coverage —
  * the LEFT JOIN is the point of a gap analysis) are emitted as
  * DOUBLE on both sides so the gate's pandas compare sees NaN/NaN
  * instead of dtype-coerced ints.
  */
object CatalogGap {

  val defaultAsOf: AsOf = AsOf("2001-08-01")

  def q47For(asOf: AsOf): Q = {
    val recent = asOf.minusDays(365)
    val hist = asOf.minusDays(730)

    Q.of(
      "q47_catalog_gap",
      s"""WITH pd AS (
        |  SELECT p_partkey, p_brand AS genre, p_type AS content_type,
        |    CASE WHEN p_size <= 17 THEN 'small' WHEN p_size <= 34 THEN 'mid' ELSE 'large' END AS maturity_rating,
        |    (p_retailprice - 900) / 2 AS rating, p_size AS age
        |  FROM part
        |), vh AS (
        |  SELECT l_partkey, l_suppkey, l_orderkey, l_shipdate, l_returnflag,
        |    (1.0 - l_discount) * 100 AS completion
        |  FROM lineitem
        |  WHERE l_shipdate > ${hist.sqlTs} AND l_shipdate <= ${asOf.sqlTs}
        |), demand AS (
        |  SELECT pd.genre, pd.content_type, pd.maturity_rating,
        |    COUNT(DISTINCT vh.l_suppkey) AS current_viewers,
        |    COUNT(*) AS current_views,
        |    CAST(SUM(CAST(vh.completion AS DECIMAL(20,6))) AS DOUBLE)
        |      / COUNT(vh.completion) AS current_completion_rate,
        |    (COUNT(CASE WHEN vh.l_shipdate > ${recent.sqlTs} THEN 1 END)
        |     - COUNT(CASE WHEN vh.l_shipdate <= ${recent.sqlTs} THEN 1 END)) * 100.0
        |      / GREATEST(COUNT(CASE WHEN vh.l_shipdate <= ${recent.sqlTs} THEN 1 END), 1) AS demand_growth_pct,
        |    COUNT(DISTINCT CASE WHEN vh.l_returnflag = 'R' THEN vh.l_orderkey END) AS watchlist_demand
        |  FROM vh JOIN pd ON vh.l_partkey = pd.p_partkey
        |  GROUP BY 1, 2, 3
        |), catalog AS (
        |  SELECT genre, content_type, maturity_rating,
        |    COUNT(DISTINCT p_partkey) AS current_catalog_size,
        |    CAST(SUM(CAST(rating AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS avg_rating,
        |    CAST(SUM(CAST(age AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS avg_age
        |  FROM pd GROUP BY 1, 2, 3
        |), cov AS (
        |  SELECT d.*, c.current_catalog_size, c.avg_rating, c.avg_age,
        |    d.current_views * 100.0
        |      / MAX(d.current_views) OVER (PARTITION BY d.genre) AS market_coverage_ratio
        |  FROM demand d LEFT JOIN catalog c USING (genre, content_type, maturity_rating)
        |), comp AS (
        |  SELECT genre, content_type, CAST(competitor_titles AS INTEGER) AS competitor_titles,
        |    CAST(competitor_avg_rating AS DOUBLE) AS competitor_avg_rating,
        |    CAST(competitor_avg_age AS DOUBLE) AS competitor_avg_age
        |  FROM (VALUES
        |    ('Brand#11', 'STANDARD', 150, 6.8, 30.0),
        |    ('Brand#12', 'PROMO',    200, 7.2, 25.0),
        |    ('Brand#13', 'ECONOMY',  180, 6.5, 20.0),
        |    ('Brand#14', 'LARGE',     45, 7.5, 15.0),
        |    ('Brand#15', 'MEDIUM',    75, 7.8, 10.0),
        |    ('Brand#21', 'STANDARD', 120, 7.0, 18.0),
        |    ('Brand#22', 'SMALL',     60, 6.2, 22.0),
        |    ('Brand#23', 'PROMO',     90, 6.9, 12.0)
        |  ) AS v(genre, content_type, competitor_titles, competitor_avg_rating, competitor_avg_age)
        |), gap AS (
        |  SELECT cov.*, comp.competitor_titles,
        |    CAST(comp.competitor_titles - cov.current_catalog_size AS DOUBLE) AS title_gap,
        |    comp.competitor_avg_rating - cov.avg_rating AS quality_gap,
        |    cov.avg_age - comp.competitor_avg_age AS freshness_gap,
        |    cov.demand_growth_pct * 0.3 + CAST(cov.watchlist_demand AS DOUBLE) * 0.01 * 0.2
        |      + ABS(CAST(comp.competitor_titles - cov.current_catalog_size AS DOUBLE)) * 0.2
        |      + (comp.competitor_avg_rating - cov.avg_rating) * 0.3 AS acquisition_priority_score
        |  FROM cov LEFT JOIN comp USING (genre, content_type)
        |  WHERE cov.current_viewers >= 3
        |), act AS (
        |  SELECT genre,
        |    string_agg(nm || ' (' || CAST(n AS VARCHAR) || ' titles)', ', '
        |               ORDER BY n DESC, nm) AS top_actors_to_target
        |  FROM (
        |    SELECT p_brand AS genre, s_name AS nm, COUNT(DISTINCT l_partkey) AS n,
        |      row_number() OVER (PARTITION BY p_brand
        |                         ORDER BY COUNT(DISTINCT l_partkey) DESC, s_name) AS rn
        |    FROM lineitem
        |    JOIN part ON l_partkey = p_partkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    WHERE p_retailprice > 914
        |    GROUP BY p_brand, s_name
        |    HAVING COUNT(DISTINCT l_partkey) >= 3
        |  ) WHERE rn <= 3
        |  GROUP BY genre
        |)
        |SELECT g.genre, g.content_type, g.maturity_rating,
        |  g.current_catalog_size, g.market_coverage_ratio,
        |  CAST(g.competitor_titles AS DOUBLE) AS competitor_titles,
        |  g.title_gap, g.quality_gap, g.freshness_gap, g.acquisition_priority_score,
        |  CASE WHEN g.acquisition_priority_score > 8 THEN 'Critical Gap'
        |       WHEN g.acquisition_priority_score > 6 THEN 'High Priority'
        |       WHEN g.acquisition_priority_score > 4 THEN 'Medium Priority'
        |       ELSE 'Low Priority' END AS gap_priority,
        |  CASE WHEN g.title_gap > 20 AND g.quality_gap > 0.5 THEN 'Major Content Acquisition'
        |       WHEN g.freshness_gap > 2 THEN 'Focus on New Releases'
        |       WHEN g.quality_gap > 0.5 THEN 'Quality Content Acquisition'
        |       WHEN g.title_gap > 10 THEN 'Expand Catalog Volume'
        |       ELSE 'Maintain Current Strategy' END AS recommended_action,
        |  CASE WHEN g.acquisition_priority_score > 8 THEN 'Allocate 20% of Budget'
        |       WHEN g.acquisition_priority_score > 6 THEN 'Allocate 15% of Budget'
        |       WHEN g.acquisition_priority_score > 4 THEN 'Allocate 10% of Budget'
        |       ELSE 'Allocate 5% of Budget' END AS budget_allocation,
        |  a.top_actors_to_target
        |FROM gap g LEFT JOIN act a ON g.genre = a.genre
        |ORDER BY acquisition_priority_score DESC NULLS LAST,
        |  g.genre, g.content_type, g.maturity_rating""".stripMargin) { t =>
      val spark = t.spark
      import spark.implicits._
      val pd = t.part.select(
        col("p_partkey"), col("p_brand").as("genre"), col("p_type").as("content_type"),
        when(col("p_size") <= 17, "small").when(col("p_size") <= 34, "mid")
          .otherwise("large").as("maturity_rating"),
        ((col("p_retailprice") - 900) / 2).as("rating"), col("p_size").as("age"))
      val vh = t.lineitem
        .filter(col("l_shipdate") > hist.tsLit && col("l_shipdate") <= asOf.tsLit)
        .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
          col("l_shipdate"), col("l_returnflag"),
          ((lit(1.0) - col("l_discount")) * 100).as("completion"))
      val inRecent = col("l_shipdate") > recent.tsLit
      val demand = vh.join(dimBroadcast(pd), col("l_partkey") === col("p_partkey"))
        .groupBy(col("genre"), col("content_type"), col("maturity_rating"))
        .agg(
          countDistinct(col("l_suppkey")).as("current_viewers"),
          count(lit(1)).as("current_views"),
          (dsum(col("completion")) / count(col("completion")))
            .as("current_completion_rate"),
          ((count(when(inRecent, 1)) - count(when(!inRecent, 1))) * lit(100.0)
            / greatest(count(when(!inRecent, 1)), lit(1L))).as("demand_growth_pct"),
          countDistinct(when(col("l_returnflag") === "R", col("l_orderkey")))
            .as("watchlist_demand"))
      val catalog = pd
        .groupBy(col("genre"), col("content_type"), col("maturity_rating"))
        .agg(
          countDistinct(col("p_partkey")).as("current_catalog_size"),
          (dsum(col("rating")) / count(lit(1))).as("avg_rating"),
          (dsum(col("age")) / count(lit(1))).as("avg_age"))
      val cov = demand
        .join(catalog, Seq("genre", "content_type", "maturity_rating"), "left")
        .withColumn("market_coverage_ratio",
          col("current_views") * lit(100.0)
            / max(col("current_views")).over(Window.partitionBy(col("genre"))))
      val comp = Seq(
        ("Brand#11", "STANDARD", 150, 6.8, 30.0),
        ("Brand#12", "PROMO", 200, 7.2, 25.0),
        ("Brand#13", "ECONOMY", 180, 6.5, 20.0),
        ("Brand#14", "LARGE", 45, 7.5, 15.0),
        ("Brand#15", "MEDIUM", 75, 7.8, 10.0),
        ("Brand#21", "STANDARD", 120, 7.0, 18.0),
        ("Brand#22", "SMALL", 60, 6.2, 22.0),
        ("Brand#23", "PROMO", 90, 6.9, 12.0))
        .toDF("genre", "content_type", "competitor_titles",
          "competitor_avg_rating", "competitor_avg_age")
      val gap = cov.join(broadcast(comp), Seq("genre", "content_type"), "left")
        .withColumn("title_gap",
          (col("competitor_titles") - col("current_catalog_size")).cast("double"))
        .withColumn("quality_gap", col("competitor_avg_rating") - col("avg_rating"))
        .withColumn("freshness_gap", col("avg_age") - col("competitor_avg_age"))
        .withColumn("acquisition_priority_score",
          col("demand_growth_pct") * 0.3 + col("watchlist_demand") * 0.01 * 0.2
            + abs(col("title_gap")) * 0.2 + col("quality_gap") * 0.3)
        .filter(col("current_viewers") >= 3)
      val sup = t.lineitem
        .join(dimBroadcast(t.part.filter(col("p_retailprice") > 914)),
          col("l_partkey") === col("p_partkey"))
        .join(dimBroadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_brand").as("genre"), col("s_name").as("nm"))
        .agg(countDistinct(col("l_partkey")).as("n"))
        .filter(col("n") >= 3)
      val act = TopK.perGroup(sup, Seq(col("genre")),
          Seq(col("n").desc, col("nm")), k = 3, rankCol = "graft_rn")
        .groupBy(col("genre"))
        .agg(expr(
          "array_join(transform(array_sort(collect_list(struct(-n AS negn, nm, n)))," +
            " x -> concat(x.nm, ' (', CAST(x.n AS STRING), ' titles)')), ', ')")
          .as("top_actors_to_target"))
      gap.join(broadcast(act), Seq("genre"), "left")
        .select(col("genre"), col("content_type"), col("maturity_rating"),
          col("current_catalog_size"), col("market_coverage_ratio"),
          col("competitor_titles").cast("double").as("competitor_titles"),
          col("title_gap"), col("quality_gap"), col("freshness_gap"),
          col("acquisition_priority_score"),
          when(col("acquisition_priority_score") > 8, "Critical Gap")
            .when(col("acquisition_priority_score") > 6, "High Priority")
            .when(col("acquisition_priority_score") > 4, "Medium Priority")
            .otherwise("Low Priority").as("gap_priority"),
          when(col("title_gap") > 20 && col("quality_gap") > 0.5, "Major Content Acquisition")
            .when(col("freshness_gap") > 2, "Focus on New Releases")
            .when(col("quality_gap") > 0.5, "Quality Content Acquisition")
            .when(col("title_gap") > 10, "Expand Catalog Volume")
            .otherwise("Maintain Current Strategy").as("recommended_action"),
          when(col("acquisition_priority_score") > 8, "Allocate 20% of Budget")
            .when(col("acquisition_priority_score") > 6, "Allocate 15% of Budget")
            .when(col("acquisition_priority_score") > 4, "Allocate 10% of Budget")
            .otherwise("Allocate 5% of Budget").as("budget_allocation"),
          col("top_actors_to_target"))
        .orderBy(col("acquisition_priority_score").desc_nulls_last,
          col("genre"), col("content_type"), col("maturity_rating"))
    }
  }

  val q47: Q = q47For(defaultAsOf)

  def all: Seq[Q] = Seq(q47)
}
