package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{AsOf, Q}
import graft.Dims.dimBroadcast
import graft.operators.TopK
import graft.functions.det._

/** q57: the eighth full reference analysis end-to-end — Geographic
  * Content Preference Mapping (/root/reference/SQL/Geographic Content
  * Preference Mapping.txt:1-130; pyspark twin) as one oracle-checked
  * composition: asOf-windowed viewership over a 10-country market →
  * per-(country, genre, type, origin, quarter) cells → regional
  * preferences with the correlated market-share subquery re-expressed
  * as a window sum and Q4-vs-Q1 growth → the PAIRWISE cross-country
  * self-join (preference similarity + content gap) → localization
  * priority ladder → the correlated recommended-content subquery
  * (top-5 unwatched titles from the partner country's origin, by
  * rating) as a ranked aggregate LEFT-JOINed back → business impact
  * from per-country user counts.
  *
  * Reference → testdata mapping (SURVEY §3): viewing_history→lineitem
  * (viewer→l_suppkey, country→the supplier's nation, completion→
  * (1−l_discount)·100, content_id→l_partkey), content→part
  * (genre→brand family `substr(p_brand,1,7)` — 5 values,
  * content_type→first word of p_type — 6 values,
  * imdb_rating→(p_retailprice−900)/2 as in q47, origin_country→
  * p_size%25 as a pseudo nation key: Domestic when it equals the
  * viewer's nation, Western for keys 0-2, Asian for 10-12, else
  * International), the reference's 10-country IN filter→
  * n_nationkey<10, subscription premium value→the q56 rate card's
  * 15.99. The reference's time-of-day ladder is dropped (l_shipdate
  * has no time component — q19 carries the time-bucket shape);
  * similarity/gap cutpoints are rescaled to this market's share range
  * (~0.8% per cell vs the reference's percents) so both priority
  * bands are populated at sf0.001/0.01/0.1.
  *
  * Plan shape at scale: the fact is read twice — once into the
  * preference cells (one exchange into the (country, genre, type,
  * origin, quarter) distinct-viewer aggregate), once into the
  * (country, content) viewed-pairs distinct that supports the NOT-IN
  * recommendation (both outputs are dim-bounded). The cell frame rp
  * (≤ countries·genres·types·origins rows) is cached and self-joined
  * with an explicit broadcast — the pairwise comparison never touches
  * the fact. Recommendations, user counts, and the rate card are
  * dim-sized broadcasts. ORDER BY priority DESC mirrors the
  * reference's (lexicographic) quirk verbatim.
  */
object Geo {

  /** A 365-day window ending 2000-12-31 covers exactly the four
    * calendar quarters of 2000, keeping the Q4-vs-Q1 growth honest.
    */
  val defaultAsOf: AsOf = AsOf("2000-12-31")
  val defaultLookbackDays = 365

  def q57For(asOf: AsOf, lookbackDays: Int): Q = {
    val start = asOf.minusDays(lookbackDays)

    Q.of(
      "q57_geo_preferences",
      s"""WITH v AS (
        |  SELECT n.n_nationkey AS country_key, n.n_name AS country,
        |    substr(p.p_brand, 1, 7) AS genre, split_part(p.p_type, ' ', 1) AS content_type,
        |    p.p_size % 25 AS origin_key, l.l_suppkey AS viewer,
        |    (1.0 - l.l_discount) * 100 AS completion,
        |    quarter(l.l_shipdate) AS quarter,
        |    l.l_partkey AS content_id
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  WHERE l.l_shipdate > ${start.sqlTs} AND l.l_shipdate <= ${asOf.sqlTs}
        |    AND n.n_nationkey < 10
        |), rv AS (
        |  SELECT country_key, country, genre, content_type,
        |    CASE WHEN origin_key = country_key THEN 'Domestic'
        |         WHEN origin_key IN (0, 1, 2) THEN 'Western'
        |         WHEN origin_key IN (10, 11, 12) THEN 'Asian'
        |         ELSE 'International' END AS content_origin,
        |    quarter,
        |    COUNT(DISTINCT viewer) AS unique_viewers,
        |    COUNT(*) AS total_views,
        |    CAST(SUM(CAST(completion AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS completion_rate
        |  FROM v GROUP BY 1,2,3,4,5,6
        |), rp AS (
        |  SELECT country_key, country, genre, content_type, content_origin,
        |    CAST(SUM(unique_viewers) AS BIGINT) AS total_viewers,
        |    CAST(SUM(total_views) AS BIGINT) AS total_views,
        |    CAST(SUM(CAST(completion_rate AS DECIMAL(20,6))) AS DOUBLE) / COUNT(completion_rate) AS avg_completion,
        |    CAST(SUM(unique_viewers) AS DOUBLE) * 100.0
        |      / CAST(SUM(SUM(unique_viewers)) OVER (PARTITION BY country) AS DOUBLE) AS market_share_pct,
        |    CAST(SUM(CASE WHEN quarter = 4 THEN unique_viewers ELSE 0 END)
        |       - SUM(CASE WHEN quarter = 1 THEN unique_viewers ELSE 0 END) AS DOUBLE)
        |      / CAST(GREATEST(SUM(CASE WHEN quarter = 1 THEN unique_viewers ELSE 0 END), 1) AS DOUBLE)
        |      * 100.0 AS quarterly_growth
        |  FROM rv GROUP BY 1,2,3,4,5
        |), cca AS (
        |  SELECT a.country_key AS key_a, a.country AS country_a,
        |    b.country_key AS key_b, b.country AS country_b,
        |    a.genre, a.content_type,
        |    ABS(a.market_share_pct - b.market_share_pct) * -0.4 +
        |      ABS(a.avg_completion - b.avg_completion) * -0.3 +
        |      CAST(CASE WHEN a.content_origin = b.content_origin THEN 0.3 ELSE 0 END AS DOUBLE) AS preference_similarity,
        |    b.market_share_pct - a.market_share_pct AS content_gap
        |  FROM rp a JOIN rp b ON a.genre = b.genre AND a.content_type = b.content_type
        |    AND a.country_key <> b.country_key
        |  WHERE a.total_viewers >= 2 AND b.total_viewers >= 2
        |), viewed AS (
        |  SELECT DISTINCT country_key, content_id FROM v
        |), cand AS (
        |  SELECT ck.country_key AS key_a, p.p_size % 25 AS origin_key,
        |    substr(p.p_brand, 1, 7) AS genre, split_part(p.p_type, ' ', 1) AS content_type,
        |    p.p_name, (p.p_retailprice - 900) / 2 AS rating, p.p_partkey,
        |    row_number() OVER (PARTITION BY ck.country_key, p.p_size % 25, substr(p.p_brand, 1, 7), split_part(p.p_type, ' ', 1)
        |                       ORDER BY (p.p_retailprice - 900) / 2 DESC, p.p_partkey) AS rn
        |  FROM part p
        |  CROSS JOIN (SELECT n_nationkey AS country_key FROM nation WHERE n_nationkey < 10) ck
        |  WHERE (p.p_retailprice - 900) / 2 > 7
        |    AND NOT EXISTS (SELECT 1 FROM viewed w WHERE w.country_key = ck.country_key AND w.content_id = p.p_partkey)
        |), rec AS (
        |  SELECT key_a, origin_key, genre, content_type,
        |    string_agg(p_name, ',' ORDER BY rn) AS recommended_content
        |  FROM cand WHERE rn <= 5
        |  GROUP BY 1, 2, 3, 4
        |), un AS (
        |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS users_in_country FROM customer GROUP BY 1
        |), lo AS (
        |  SELECT cca.*,
        |    CASE WHEN preference_similarity > -1 AND content_gap > 1.5 THEN 'High Priority'
        |         WHEN preference_similarity > -3 AND content_gap > 0.75 THEN 'Medium Priority'
        |         ELSE 'Low Priority' END AS localization_priority
        |  FROM cca WHERE content_gap > 0.5
        |)
        |SELECT lo.country_a, lo.country_b, lo.genre, lo.content_type,
        |  lo.preference_similarity, lo.content_gap, lo.localization_priority,
        |  rec.recommended_content,
        |  lo.content_gap * CAST(un.users_in_country AS DOUBLE) * 0.01 * 15.99 AS estimated_revenue_impact
        |FROM lo
        |LEFT JOIN rec ON rec.key_a = lo.key_a AND rec.origin_key = lo.key_b
        |  AND rec.genre = lo.genre AND rec.content_type = lo.content_type
        |JOIN un ON un.c_nationkey = lo.key_a
        |WHERE lo.localization_priority <> 'Low Priority'
        |ORDER BY lo.localization_priority DESC, estimated_revenue_impact DESC,
        |  lo.country_a, lo.country_b, lo.genre, lo.content_type""".stripMargin) { t =>
      val partDim = t.part.select(col("p_partkey"),
        substring(col("p_brand"), 1, 7).as("genre"),
        split(col("p_type"), " ").getItem(0).as("content_type"),
        (col("p_size") % 25).as("origin_key"),
        col("p_name"), col("p_retailprice"))
      val market = t.nation.filter(col("n_nationkey") < 10)
        .select(col("n_nationkey").as("country_key"), col("n_name").as("country"))

      val v = t.lineitem
        .filter(col("l_shipdate") > start.tsLit && col("l_shipdate") <= asOf.tsLit)
        .join(dimBroadcast(partDim.select(col("p_partkey"), col("genre"),
          col("content_type"), col("origin_key"))),
          col("p_partkey") === col("l_partkey"))
        .join(dimBroadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(market), col("country_key") === col("s_nationkey"))
        .select(col("country_key"), col("country"), col("genre"), col("content_type"),
          col("origin_key"), col("l_suppkey").as("viewer"),
          ((lit(1.0) - col("l_discount")) * 100).as("completion"),
          quarter(col("l_shipdate")).as("quarter"),
          col("l_partkey").as("content_id"))

      val rv = v
        .withColumn("content_origin",
          when(col("origin_key") === col("country_key"), "Domestic")
            .when(col("origin_key").isin(0, 1, 2), "Western")
            .when(col("origin_key").isin(10, 11, 12), "Asian")
            .otherwise("International"))
        .groupBy(col("country_key"), col("country"), col("genre"), col("content_type"),
          col("content_origin"), col("quarter"))
        .agg(
          countDistinct(col("viewer")).as("unique_viewers"),
          count(lit(1)).as("total_views"),
          (dsum(col("completion")) / count(lit(1))).as("completion_rate"))

      val shareW = Window.partitionBy(col("country"))
      // cell frame: ≤ |countries|·|genres|·|types|·|origins| rows at
      // any scale — cached so the pairwise self-join (and nothing
      // downstream) ever re-derives the fact lineage
      val rp = graft.CacheScope.trackedCache(rv
        .groupBy(col("country_key"), col("country"), col("genre"), col("content_type"),
          col("content_origin"))
        .agg(
          sum(col("unique_viewers")).as("total_viewers"),
          sum(col("total_views")).as("total_views"),
          (dsum(col("completion_rate")) / count(col("completion_rate")))
            .as("avg_completion"),
          (sum(col("unique_viewers")).cast("double") * 100.0)
            .as("share_num"),
          sum(when(col("quarter") === 4, col("unique_viewers")).otherwise(0))
            .as("q4_viewers"),
          sum(when(col("quarter") === 1, col("unique_viewers")).otherwise(0))
            .as("q1_viewers"))
        .withColumn("market_share_pct",
          col("share_num") / sum(col("total_viewers")).over(shareW).cast("double"))
        .withColumn("quarterly_growth",
          (col("q4_viewers") - col("q1_viewers")).cast("double")
            / greatest(col("q1_viewers"), lit(1)).cast("double") * 100.0)
        .filter(col("total_viewers") >= 2))

      val a = rp.select(col("country_key").as("key_a"), col("country").as("country_a"),
        col("genre"), col("content_type"), col("content_origin").as("origin_a"),
        col("market_share_pct").as("share_a"), col("avg_completion").as("comp_a"))
      val b = rp.select(col("country_key").as("key_b"), col("country").as("country_b"),
        col("genre").as("genre_b"), col("content_type").as("type_b"),
        col("content_origin").as("origin_b"),
        col("market_share_pct").as("share_b"), col("avg_completion").as("comp_b"))
      val cca = a.join(broadcast(b),
          col("genre") === col("genre_b") && col("content_type") === col("type_b") &&
            col("key_a") =!= col("key_b"))
        .select(col("key_a"), col("country_a"), col("key_b"), col("country_b"),
          col("genre"), col("content_type"),
          (abs(col("share_a") - col("share_b")) * -0.4 +
            abs(col("comp_a") - col("comp_b")) * -0.3 +
            when(col("origin_a") === col("origin_b"), 0.3).otherwise(0.0)
              .cast("double")).as("preference_similarity"),
          (col("share_b") - col("share_a")).as("content_gap"))

      val viewed = v.select(col("country_key").as("w_key"), col("content_id").as("w_cid"))
        .distinct()
      // The reference's market is a literal 10-country IN list, mapped
      // to nationkeys 0..9 (SURVEY §3) — so the candidate fan-out is a
      // literal explode: pure codegen, no join node, no exchange
      // (previously a crossJoin over a nation-derived frame, the one
      // non-literal BNLJ in the registry). A key with no actual data
      // falls out downstream exactly as with the oracle's
      // nation-derived list: rec only left-joins into lo, and lo
      // requires the country to have preference cells.
      val cand = partDim
        .withColumn("rating", (col("p_retailprice") - 900) / 2)
        .filter(col("rating") > 7)
        .withColumn("country_key", explode(lit((0 until 10).toArray)))
        .join(viewed,
          col("w_key") === col("country_key") && col("w_cid") === col("p_partkey"),
          "left_anti")
      val ranked = TopK.perGroup(cand,
        Seq(col("country_key"), col("origin_key"), col("genre"), col("content_type")),
        Seq(col("rating").desc, col("p_partkey")), k = 5, rankCol = "rn")
      val rec = ranked
        .groupBy(col("country_key").as("r_key_a"), col("origin_key").as("r_origin"),
          col("genre").as("r_genre"), col("content_type").as("r_type"))
        .agg(expr(
          "array_join(transform(array_sort(collect_list(struct(rn, p_name)))," +
            " x -> x.p_name), ',')").as("recommended_content"))

      val un = t.customer.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("users_in_country"))

      cca
        .filter(col("content_gap") > 0.5)
        .withColumn("localization_priority",
          when(col("preference_similarity") > -1 && col("content_gap") > 1.5,
            "High Priority")
            .when(col("preference_similarity") > -3 && col("content_gap") > 0.75,
              "Medium Priority")
            .otherwise("Low Priority"))
        .filter(col("localization_priority") =!= "Low Priority")
        .join(broadcast(rec),
          col("r_key_a") === col("key_a") && col("r_origin") === col("key_b") &&
            col("r_genre") === col("genre") && col("r_type") === col("content_type"),
          "left")
        .join(broadcast(un), col("c_nationkey") === col("key_a"))
        .select(col("country_a"), col("country_b"), col("genre"), col("content_type"),
          col("preference_similarity"), col("content_gap"), col("localization_priority"),
          col("recommended_content"),
          (col("content_gap") * col("users_in_country").cast("double") * 0.01 * 15.99)
            .as("estimated_revenue_impact"))
        .orderBy(col("localization_priority").desc, col("estimated_revenue_impact").desc,
          col("country_a"), col("country_b"), col("genre"), col("content_type"))
    }
  }

  val q57: Q = q57For(defaultAsOf, defaultLookbackDays)

  def all: Seq[Q] = Seq(q57)
}
