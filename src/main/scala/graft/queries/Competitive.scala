package graft.queries

import org.apache.spark.sql.functions._
import graft.{AsOf, Q}
import graft.Dims.dimBroadcast
import graft.functions.det._

/** q67: the sixteenth full reference analysis end-to-end — Competitive
  * Content Benchmarking (/root/reference/SQL/Competitive Content
  * Benchmarking.txt:1-150; pyspark twin) as one oracle-checked
  * composition: industry benchmark cells (avg viewers/completion/
  * rating + PERCENTILE_CONT 0.75 viewers / 0.9 completion thresholds)
  * → platform per-content performance → gap-vs-benchmark columns →
  * viewer/retention performance tiers → weighted competitive score +
  * advantage ladder → strategic recommendation + the two correlated
  * output subqueries (higher-performing genres GROUP_CONCAT LIMIT 3,
  * successful-content budget average).
  *
  * Reference → testdata mapping (SURVEY §3): content→part (title→
  * p_name, genre→brand number mod 5 per q63, content_type→p_type,
  * maturity_rating→p_size bands PG/TV-14/TV-MA — no rating attribute
  * exists), viewing_history→lineitem in an asOf window (the
  * reference's release_year >= current-3 temporal scope),
  * viewer→l_suppkey, completion→(1−l_discount)·100,
  * imdb_rating→(content_id mod 56)/10+3.5 (deterministic proxy; no
  * ratings table), production/marketing budget→retailprice·100 /
  * size·50 (the q58 deterministic-costs rule). The reference's
  * `industry_content_data` table has no testdata equivalent, so the
  * industry is a DISJOINT CATALOG SLICE: contents with
  * content_id % 5 ∈ {2,3,4} form the benchmark population, % 5 ∈
  * {0,1} the platform under analysis — same metrics, no shared rows.
  *
  * Deviations (documented): min-sample HAVING re-banded 1000→3
  * viewers and the gap cutpoints 1000→2 viewers / 5→2 completion
  * points (testdata scale); the reference's computed-but-unused
  * total_watch_time / cost_per_viewer / viewers_per_thousand_dollars
  * columns are dropped (budget machinery stays oracle-checked through
  * successful_content_budget); the benchmark join key drops nothing —
  * all three reference attributes (genre, content_type, maturity) are
  * mapped. The reference's 'Enhance Discovery' strategic branch is
  * STRUCTURALLY UNREACHABLE under its own weights (score < 0.4 forces
  * the retention component to its 0.3 floor, which forces
  * completion_gap < 0, which fires 'Improve Content Quality' first);
  * the dead branch is mirrored verbatim for fidelity.
  *
  * The correlated higher-performing-genres subquery (distinct genres
  * of higher-scoring same-type contents, ORDER BY score DESC LIMIT 3)
  * dedups rows to their genre's MAX score — "exists a higher-scoring
  * row of genre g" ⟺ "max score of g exceeds mine", and
  * GROUP_CONCAT(DISTINCT … ORDER BY score DESC) places each genre at
  * its highest-scoring row — so it collapses to a per-(type, genre)
  * max aggregate (≤30 rows) broadcast back as a sorted struct array,
  * with the per-row filter/slice/join a pure column expression: no
  * per-row shuffle, deterministic tie-break (genre asc) on both
  * engines. The budget subquery likewise collapses to a per-(genre,
  * type) sorted qualifying-budget array (exact left-fold average, the
  * q58 rule) broadcast back.
  *
  * Plan shape at scale: ONE fact scan (shipdate window pushed), part
  * dim broadcast, ONE l_partkey exchange into the per-content
  * aggregate; the cached per-content frame (|catalog| rows — a dim,
  * not the fact) splits into the two slices; benchmark cells (≤90
  * rows), genre-max arrays, and budget arrays are all broadcast onto
  * it. Nothing after the first aggregate touches the fact.
  */
object Competitive {

  val defaultAsOf: AsOf = AsOf("1997-06-30")
  val defaultLookbackDays = 365

  def q67For(asOf: AsOf, lookbackDays: Int): Q = {
    val start = asOf.minusDays(lookbackDays)

    Q.of(
      "q67_competitive_benchmark",
      s"""WITH pc AS (
        |  SELECT l.l_partkey AS content_id,
        |    p.p_name AS title,
        |    'G' || CAST(CAST(substr(p.p_brand, 7) AS BIGINT) % 5 AS VARCHAR) AS genre,
        |    p.p_type AS content_type,
        |    CASE WHEN p.p_size < 17 THEN 'PG' WHEN p.p_size < 34 THEN 'TV-14' ELSE 'TV-MA' END AS maturity_tier,
        |    MAX(p.p_retailprice) AS p_retailprice, MAX(p.p_size) AS p_size,
        |    CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS viewers,
        |    CAST(SUM(CAST((1.0 - l.l_discount) * 100 AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS completion_rate,
        |    CAST(l.l_partkey % 56 AS DOUBLE) / CAST(10 AS DOUBLE) + CAST(3.5 AS DOUBLE) AS imdb_rating
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE l.l_shipdate > ${start.sqlTs} AND l.l_shipdate <= ${asOf.sqlTs}
        |  GROUP BY 1, 2, 3, 4, 5
        |), pcb AS (
        |  SELECT *,
        |    CAST(p_retailprice AS DOUBLE) * 100 AS production_budget,
        |    CAST(p_size AS DOUBLE) * 50 AS marketing_budget
        |  FROM pc
        |), ib AS (
        |  SELECT genre, content_type, maturity_tier,
        |    COUNT(*) AS industry_titles,
        |    CAST(CAST(SUM(viewers) AS BIGINT) AS DOUBLE) / COUNT(*) AS industry_avg_viewers,
        |    list_reduce(list_sort(list(completion_rate)), (a, b) -> a + b) / CAST(COUNT(*) AS DOUBLE) AS industry_avg_completion,
        |    list_reduce(list_sort(list(imdb_rating)), (a, b) -> a + b) / CAST(COUNT(*) AS DOUBLE) AS industry_avg_rating,
        |    list_sort(list(CAST(viewers AS DOUBLE))) AS v_arr,
        |    list_sort(list(completion_rate)) AS c_arr
        |  FROM pcb WHERE content_id % 5 >= 2
        |  GROUP BY 1, 2, 3
        |), ibq AS (
        |  SELECT genre, content_type, maturity_tier, industry_titles,
        |    industry_avg_viewers, industry_avg_completion, industry_avg_rating,
        |    v_arr[1 + CAST(floor(0.75 * CAST(industry_titles - 1 AS DOUBLE)) AS INT)]
        |      + (v_arr[1 + CAST(ceil(0.75 * CAST(industry_titles - 1 AS DOUBLE)) AS INT)]
        |         - v_arr[1 + CAST(floor(0.75 * CAST(industry_titles - 1 AS DOUBLE)) AS INT)])
        |        * (0.75 * CAST(industry_titles - 1 AS DOUBLE) - floor(0.75 * CAST(industry_titles - 1 AS DOUBLE))) AS industry_top_25_viewers,
        |    c_arr[1 + CAST(floor(0.9 * CAST(industry_titles - 1 AS DOUBLE)) AS INT)]
        |      + (c_arr[1 + CAST(ceil(0.9 * CAST(industry_titles - 1 AS DOUBLE)) AS INT)]
        |         - c_arr[1 + CAST(floor(0.9 * CAST(industry_titles - 1 AS DOUBLE)) AS INT)])
        |        * (0.9 * CAST(industry_titles - 1 AS DOUBLE) - floor(0.9 * CAST(industry_titles - 1 AS DOUBLE))) AS industry_top_10_completion
        |  FROM ib
        |), ca0 AS (
        |  SELECT pcb.content_id, pcb.title, pcb.genre, pcb.content_type, pcb.maturity_tier,
        |    pcb.viewers AS platform_viewers, pcb.completion_rate AS platform_completion_rate,
        |    pcb.imdb_rating, pcb.production_budget,
        |    i.industry_avg_viewers, i.industry_avg_completion, i.industry_avg_rating,
        |    i.industry_top_25_viewers, i.industry_top_10_completion,
        |    CAST(pcb.viewers AS DOUBLE) - i.industry_avg_viewers AS viewer_gap_vs_industry,
        |    pcb.completion_rate - i.industry_avg_completion AS completion_gap_vs_industry,
        |    pcb.imdb_rating - i.industry_avg_rating AS rating_gap_vs_industry,
        |    CASE WHEN CAST(pcb.viewers AS DOUBLE) >= i.industry_top_25_viewers THEN 'Industry Leader'
        |         WHEN CAST(pcb.viewers AS DOUBLE) >= i.industry_avg_viewers THEN 'Above Average'
        |         WHEN CAST(pcb.viewers AS DOUBLE) >= i.industry_avg_viewers * CAST(0.7 AS DOUBLE) THEN 'Industry Average'
        |         ELSE 'Below Average' END AS viewer_performance_tier,
        |    CASE WHEN pcb.completion_rate >= i.industry_top_10_completion THEN 'Excellent Retention'
        |         WHEN pcb.completion_rate >= i.industry_avg_completion THEN 'Good Retention'
        |         ELSE 'Needs Improvement' END AS retention_performance_tier
        |  FROM pcb
        |  JOIN ibq i ON i.genre = pcb.genre AND i.content_type = pcb.content_type
        |            AND i.maturity_tier = pcb.maturity_tier
        |  WHERE pcb.content_id % 5 < 2 AND pcb.viewers >= 3
        |), ca AS (
        |  SELECT *,
        |    (CASE WHEN viewer_performance_tier = 'Industry Leader' THEN CAST(1.0 AS DOUBLE)
        |          WHEN viewer_performance_tier = 'Above Average' THEN CAST(0.7 AS DOUBLE)
        |          WHEN viewer_performance_tier = 'Industry Average' THEN CAST(0.5 AS DOUBLE)
        |          ELSE CAST(0.3 AS DOUBLE) END * CAST(0.4 AS DOUBLE)
        |     + CASE WHEN retention_performance_tier = 'Excellent Retention' THEN CAST(1.0 AS DOUBLE)
        |            WHEN retention_performance_tier = 'Good Retention' THEN CAST(0.7 AS DOUBLE)
        |            ELSE CAST(0.3 AS DOUBLE) END * CAST(0.3 AS DOUBLE)
        |     + CASE WHEN rating_gap_vs_industry > CAST(0.5 AS DOUBLE) THEN CAST(1.0 AS DOUBLE)
        |            WHEN rating_gap_vs_industry > CAST(0 AS DOUBLE) THEN CAST(0.7 AS DOUBLE)
        |            ELSE CAST(0.3 AS DOUBLE) END * CAST(0.3 AS DOUBLE)) AS competitive_score,
        |    CASE WHEN viewer_gap_vs_industry > 2 AND completion_gap_vs_industry > 2 THEN 'Dual Strength: Reach & Engagement'
        |         WHEN viewer_gap_vs_industry > 2 THEN 'Strength: Broad Appeal'
        |         WHEN completion_gap_vs_industry > 2 THEN 'Strength: High Engagement'
        |         WHEN rating_gap_vs_industry > 0.5 THEN 'Strength: Critical Acclaim'
        |         ELSE 'No Clear Competitive Advantage' END AS competitive_advantage
        |  FROM ca0
        |), gm AS (
        |  SELECT content_type, genre, max(competitive_score) AS gmax
        |  FROM ca GROUP BY 1, 2
        |), bm AS (
        |  SELECT genre, content_type,
        |    list_sort(list(production_budget) FILTER (WHERE competitive_score > 0.8)) AS barr
        |  FROM ca GROUP BY 1, 2
        |)
        |SELECT ca.content_id, ca.title, ca.genre, ca.content_type,
        |  ca.platform_viewers, ca.platform_completion_rate, ca.imdb_rating,
        |  ca.competitive_score, ca.competitive_advantage,
        |  ca.viewer_performance_tier, ca.retention_performance_tier,
        |  CASE WHEN ca.competitive_score > 0.8 THEN 'Leverage as Flagship Content'
        |       WHEN ca.competitive_score > 0.6 AND ca.viewer_gap_vs_industry > 0 THEN 'Scale Promotion'
        |       WHEN ca.competitive_score < 0.4 AND ca.completion_gap_vs_industry < 0 THEN 'Improve Content Quality'
        |       WHEN ca.competitive_score < 0.4 AND ca.viewer_gap_vs_industry < 0 THEN 'Enhance Discovery'
        |       ELSE 'Maintain Current Strategy' END AS strategic_recommendation,
        |  (SELECT array_to_string(list(gm.genre ORDER BY gm.gmax DESC, gm.genre)[1:3], ',')
        |   FROM gm WHERE gm.content_type = ca.content_type AND gm.gmax > ca.competitive_score) AS higher_performing_genres,
        |  (CASE WHEN len(bm.barr) > 0
        |        THEN list_reduce(bm.barr, (a, b) -> a + b) / CAST(len(bm.barr) AS DOUBLE) END) AS successful_content_budget
        |FROM ca
        |LEFT JOIN bm ON bm.genre = ca.genre AND bm.content_type = ca.content_type
        |ORDER BY ca.competitive_score DESC, ca.platform_viewers DESC, ca.content_id""".stripMargin) { t =>
      val partDim = t.part.select(col("p_partkey"), col("p_name"),
        concat(lit("G"), (substring(col("p_brand"), 7, 10).cast("long") % 5).cast("string"))
          .as("genre"),
        col("p_type").as("content_type"),
        when(col("p_size") < 17, "PG").when(col("p_size") < 34, "TV-14").otherwise("TV-MA")
          .as("maturity_tier"),
        col("p_retailprice"), col("p_size"))

      val pcb = graft.CacheScope.trackedCache(t.lineitem
        .filter(col("l_shipdate") > start.tsLit && col("l_shipdate") <= asOf.tsLit)
        .join(dimBroadcast(partDim), col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_partkey").as("content_id"), col("p_name").as("title"),
          col("genre"), col("content_type"), col("maturity_tier"))
        .agg(
          max(col("p_retailprice")).as("p_retailprice"),
          max(col("p_size")).as("p_size"),
          size(collect_set(col("l_suppkey"))).cast("long").as("viewers"),
          (dsum((lit(1.0) - col("l_discount")) * 100) / count(lit(1)))
            .as("completion_rate"))
        .withColumn("imdb_rating",
          (col("content_id") % 56).cast("double") / lit(10).cast("double") +
            lit(3.5).cast("double"))
        .withColumn("production_budget", col("p_retailprice").cast("double") * 100)
        .withColumn("marketing_budget", col("p_size").cast("double") * 50))

      val ibq = pcb.filter(col("content_id") % 5 >= 2)
        .groupBy(col("genre"), col("content_type"), col("maturity_tier"))
        .agg(
          count(lit(1)).as("industry_titles"),
          (sum(col("viewers")).cast("double") / count(lit(1)))
            .as("industry_avg_viewers"),
          (aggregate(sort_array(collect_list(col("completion_rate"))), lit(0.0),
            (a, x) => a + x) / count(lit(1)).cast("double"))
            .as("industry_avg_completion"),
          (aggregate(sort_array(collect_list(col("imdb_rating"))), lit(0.0),
            (a, x) => a + x) / count(lit(1)).cast("double"))
            .as("industry_avg_rating"),
          sort_array(collect_list(col("viewers").cast("double"))).as("v_arr"),
          sort_array(collect_list(col("completion_rate"))).as("c_arr"))
        .withColumn("industry_top_25_viewers",
          dpercentile(col("v_arr"), col("industry_titles"), 0.75))
        .withColumn("industry_top_10_completion",
          dpercentile(col("c_arr"), col("industry_titles"), 0.9))
        .drop("v_arr", "c_arr")

      val pv = col("platform_viewers").cast("double")
      val ca = graft.CacheScope.trackedCache(pcb
        .filter(col("content_id") % 5 < 2 && col("viewers") >= 3)
        .withColumnRenamed("viewers", "platform_viewers")
        .withColumnRenamed("completion_rate", "platform_completion_rate")
        .join(broadcast(ibq), Seq("genre", "content_type", "maturity_tier"))
        .withColumn("viewer_gap_vs_industry", pv - col("industry_avg_viewers"))
        .withColumn("completion_gap_vs_industry",
          col("platform_completion_rate") - col("industry_avg_completion"))
        .withColumn("rating_gap_vs_industry",
          col("imdb_rating") - col("industry_avg_rating"))
        .withColumn("viewer_performance_tier",
          when(pv >= col("industry_top_25_viewers"), "Industry Leader")
            .when(pv >= col("industry_avg_viewers"), "Above Average")
            .when(pv >= col("industry_avg_viewers") * lit(0.7).cast("double"),
              "Industry Average")
            .otherwise("Below Average"))
        .withColumn("retention_performance_tier",
          when(col("platform_completion_rate") >= col("industry_top_10_completion"),
            "Excellent Retention")
            .when(col("platform_completion_rate") >= col("industry_avg_completion"),
              "Good Retention")
            .otherwise("Needs Improvement"))
        .withColumn("competitive_score",
          when(col("viewer_performance_tier") === "Industry Leader", lit(1.0).cast("double"))
            .when(col("viewer_performance_tier") === "Above Average", lit(0.7).cast("double"))
            .when(col("viewer_performance_tier") === "Industry Average", lit(0.5).cast("double"))
            .otherwise(lit(0.3).cast("double")) * lit(0.4).cast("double") +
            when(col("retention_performance_tier") === "Excellent Retention", lit(1.0).cast("double"))
              .when(col("retention_performance_tier") === "Good Retention", lit(0.7).cast("double"))
              .otherwise(lit(0.3).cast("double")) * lit(0.3).cast("double") +
            when(col("rating_gap_vs_industry") > lit(0.5).cast("double"), lit(1.0).cast("double"))
              .when(col("rating_gap_vs_industry") > lit(0).cast("double"), lit(0.7).cast("double"))
              .otherwise(lit(0.3).cast("double")) * lit(0.3).cast("double"))
        .withColumn("competitive_advantage",
          when(col("viewer_gap_vs_industry") > 2 && col("completion_gap_vs_industry") > 2,
            "Dual Strength: Reach & Engagement")
            .when(col("viewer_gap_vs_industry") > 2, "Strength: Broad Appeal")
            .when(col("completion_gap_vs_industry") > 2, "Strength: High Engagement")
            .when(col("rating_gap_vs_industry") > 0.5, "Strength: Critical Acclaim")
            .otherwise("No Clear Competitive Advantage")))

      // the correlated genre subquery as a per-type sorted (−max-score,
      // genre) struct array broadcast back: strictly-higher filter +
      // LIMIT 3 become pure array expressions per row
      val gl = ca.groupBy(col("content_type"), col("genre"))
        .agg(max(col("competitive_score")).as("gmax"))
        .groupBy(col("content_type"))
        .agg(sort_array(collect_list(struct((-col("gmax")).as("ng"),
          col("genre").as("g")))).as("garr"))

      val bm = ca.groupBy(col("genre"), col("content_type"))
        .agg(sort_array(collect_list(
          when(col("competitive_score") > 0.8, col("production_budget")))).as("barr"))

      val hpg = filter(col("garr"),
        x => x.getField("ng") < -col("competitive_score"))
      ca.join(broadcast(gl), Seq("content_type"))
        .join(broadcast(bm), Seq("genre", "content_type"), "left")
        .withColumn("strategic_recommendation",
          when(col("competitive_score") > 0.8, "Leverage as Flagship Content")
            .when(col("competitive_score") > 0.6 && col("viewer_gap_vs_industry") > 0,
              "Scale Promotion")
            .when(col("competitive_score") < 0.4 && col("completion_gap_vs_industry") < 0,
              "Improve Content Quality")
            .when(col("competitive_score") < 0.4 && col("viewer_gap_vs_industry") < 0,
              "Enhance Discovery")
            .otherwise("Maintain Current Strategy"))
        .withColumn("higher_performing_genres",
          when(size(hpg) > 0,
            array_join(slice(transform(hpg, x => x.getField("g")), 1, 3), ",")))
        .withColumn("successful_content_budget",
          when(size(col("barr")) > 0,
            aggregate(col("barr"), lit(0.0), (a, x) => a + x) /
              size(col("barr")).cast("double")))
        .select(col("content_id"), col("title"), col("genre"), col("content_type"),
          col("platform_viewers"), col("platform_completion_rate"), col("imdb_rating"),
          col("competitive_score"), col("competitive_advantage"),
          col("viewer_performance_tier"), col("retention_performance_tier"),
          col("strategic_recommendation"), col("higher_performing_genres"),
          col("successful_content_budget"))
        .orderBy(col("competitive_score").desc, col("platform_viewers").desc,
          col("content_id"))
    }
  }

  val q67: Q = q67For(defaultAsOf, defaultLookbackDays)

  def all: Seq[Q] = Seq(q67)
}
