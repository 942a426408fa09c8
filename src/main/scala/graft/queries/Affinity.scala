package graft.queries

import org.apache.spark.sql.functions._
import graft.{AsOf, Q}
import graft.Dims.dimBroadcast
import graft.functions.det._

/** q63: the twelfth full reference analysis end-to-end — Content
  * Affinity and Cross-Genre Analysis (/root/reference/SQL/Content
  * Affinity and Cross-Genre Analysis.txt:1-92; pyspark twin) as one
  * oracle-checked composition: asOf-windowed per-(profile, genre)
  * affinity (distinct contents, active days, completion → affinity
  * score, HAVING ≥ 3 contents) → the cross-genre pair self-join with
  * compatibility products and the reference's correlated
  * co-viewing-days subquery → the genre relationship network (user
  * counts, compatibility / co-viewing averages, relationship
  * strength) → content-gap and opportunity enrichments.
  *
  * Reference → testdata mapping (SURVEY §3): profile→l_suppkey,
  * content→l_partkey, completion→(1−l_discount)·100,
  * start_time→l_shipdate, genre→`brand number mod 5` ('G0'..'G4' —
  * p_brand here is Brand#1..25, so the q58-style 7-char prefix
  * buckets 44% of parts under Brand#1; the mod keeps the five genres
  * even, which a pair NETWORK needs).
  *
  * Re-designs vs the reference (documented deviations): the
  * correlated co-viewing-days subquery (days watching g1 that also
  * saw g2) becomes `size(array_intersect)` over the pair's two
  * BOUNDED per-(profile, genre) date sets — collected once in the
  * affinity pass, never re-touching the fact. The affinity cutpoints
  * are re-banded to ≥ 32 primary / ≥ 30 secondary (the reference's
  * 0.6/0.4 are vacuous against a score whose completion term alone
  * is ~28) and the network HAVING to ≥ 2 users (q58's rule). The
  * final content-gap subquery counts secondary-genre contents not
  * yet watched by this pair's users (the reference counts contents
  * not sharing actors via the content_actors table; q75 now derives
  * a real content_actors-shaped bridge — top-3 suppliers per content
  * from the fact, see Predictive.scala — but this query keeps the
  * not-yet-watched form, which is the semantically closer gap measure
  * for genre pairs); the opportunity subquery (qualifying
  * primary-genre users) is exact. Pair rows are unique per
  * (profile, g1, g2) by construction, so the reference's
  * COUNT(DISTINCT profile_id) is written as count(*) on both sides.
  *
  * Plan shape at scale: ONE fact scan → ONE exchange into the
  * (profile, genre) affinity aggregate; the resulting frame
  * (≤ |profiles|·5 rows, date/content sets bounded by the window) is
  * CACHED and reused three ways — both sides of the pair self-join
  * (co-partitioned on profile; the exchange carries the slim frame,
  * not the fact) and the per-genre qualifying-user counts. The
  * watched-content distinct runs on the exploded pair frame
  * (dim-scaled), and every enrichment joins broadcast onto the
  * ≤ 20-row network.
  */
object Affinity {

  val defaultAsOf: AsOf = AsOf("1997-06-30")
  val defaultLookbackDays = 90

  def q63For(asOf: AsOf, lookbackDays: Int): Q = {
    val start = asOf.minusDays(lookbackDays)

    Q.of(
      "q63_genre_affinity",
      s"""WITH af AS (
        |  SELECT l_suppkey AS profile,
        |    'G' || CAST(CAST(substr(p_brand, 7) AS BIGINT) % 5 AS VARCHAR) AS genre,
        |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS genre_view_count,
        |    CAST(count(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT) AS active_days,
        |    CAST(SUM(CAST((1.0 - l_discount) * 100 AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS avg_completion,
        |    list(DISTINCT CAST(l_shipdate AS DATE)) AS day_arr,
        |    list(DISTINCT l_partkey) AS content_arr
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate > ${start.sqlTs} AND l_shipdate <= ${asOf.sqlTs}
        |  GROUP BY 1, 2 HAVING count(DISTINCT l_partkey) >= 3
        |), sc AS (
        |  SELECT *, CAST(genre_view_count AS DOUBLE) * 0.4 + avg_completion * 0.3
        |    + CAST(active_days AS DOUBLE) * 0.3 AS genre_affinity_score
        |  FROM af
        |), gc AS (
        |  SELECT a1.profile, a1.genre AS primary_genre, a2.genre AS secondary_genre,
        |    a1.genre_affinity_score * a2.genre_affinity_score AS compatibility_score,
        |    CAST(len(list_intersect(a1.day_arr, a2.day_arr)) AS BIGINT) AS co_viewing_days,
        |    a2.content_arr AS sec_contents
        |  FROM sc a1 JOIN sc a2 ON a1.profile = a2.profile
        |  WHERE a1.genre != a2.genre
        |    AND a1.genre_affinity_score >= 32 AND a2.genre_affinity_score >= 30
        |), gn AS (
        |  SELECT primary_genre, secondary_genre,
        |    count(*) AS user_count,
        |    list_reduce(list_sort(list(compatibility_score)), (x, y) -> x + y)
        |      / CAST(count(*) AS DOUBLE) AS avg_compatibility,
        |    CAST(CAST(SUM(co_viewing_days) AS BIGINT) AS DOUBLE) / count(*) AS avg_co_viewing_days
        |  FROM gc GROUP BY 1, 2 HAVING count(*) >= 2
        |), watched AS (
        |  SELECT primary_genre, secondary_genre, count(DISTINCT c) AS watched_sec_contents
        |  FROM (SELECT primary_genre, secondary_genre, unnest(sec_contents) AS c FROM gc)
        |  GROUP BY 1, 2
        |), gt AS (
        |  SELECT 'G' || CAST(CAST(substr(p_brand, 7) AS BIGINT) % 5 AS VARCHAR) AS genre,
        |    count(*) AS genre_contents
        |  FROM part GROUP BY 1
        |), qual AS (
        |  SELECT genre, count(*) AS qualifying_users FROM sc
        |  WHERE genre_affinity_score >= 32 GROUP BY 1
        |), enr AS (
        |  SELECT gn.*,
        |    CAST(gn.user_count AS DOUBLE) * 0.5 + gn.avg_compatibility * 0.3
        |      + gn.avg_co_viewing_days * 0.2 AS relationship_strength,
        |    gt.genre_contents - w.watched_sec_contents AS potential_cross_genre_content,
        |    CAST(q.qualifying_users AS DOUBLE) AS qual_users
        |  FROM gn
        |  JOIN watched w ON w.primary_genre = gn.primary_genre
        |    AND w.secondary_genre = gn.secondary_genre
        |  JOIN gt ON gt.genre = gn.secondary_genre
        |  JOIN qual q ON q.genre = gn.primary_genre
        |)
        |SELECT primary_genre, secondary_genre, user_count, avg_compatibility,
        |  avg_co_viewing_days, relationship_strength, potential_cross_genre_content,
        |  relationship_strength * qual_users * 0.0001 AS opportunity_score
        |FROM enr
        |ORDER BY relationship_strength DESC, opportunity_score DESC,
        |  primary_genre, secondary_genre""".stripMargin) { t =>
      val genreOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        brand => concat(lit("G"), (substring(brand, 7, 10).cast("long") % 5).cast("string"))

      val af = graft.CacheScope.trackedCache(t.lineitem
        .filter(col("l_shipdate") > start.tsLit && col("l_shipdate") <= asOf.tsLit)
        .join(dimBroadcast(t.part.select(col("p_partkey"),
          genreOf(col("p_brand")).as("genre"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_suppkey").as("profile"), col("genre"))
        .agg(
          size(collect_set(col("l_partkey"))).cast("long").as("genre_view_count"),
          size(collect_set(to_date(col("l_shipdate")))).cast("long").as("active_days"),
          (sum(((lit(1.0) - col("l_discount")) * 100).cast(D20_6)).cast("double") /
            count(lit(1))).as("avg_completion"),
          collect_set(to_date(col("l_shipdate"))).as("day_arr"),
          collect_set(col("l_partkey")).as("content_arr"))
        .filter(col("genre_view_count") >= 3)
        .withColumn("genre_affinity_score",
          col("genre_view_count").cast("double") * 0.4 + col("avg_completion") * 0.3 +
            col("active_days").cast("double") * 0.3))

      val a1 = af.select(col("profile"), col("genre").as("primary_genre"),
        col("genre_affinity_score").as("s1"), col("day_arr").as("d1"))
        .filter(col("s1") >= 32)
      val a2 = af.select(col("profile").as("profile2"), col("genre").as("secondary_genre"),
        col("genre_affinity_score").as("s2"), col("day_arr").as("d2"),
        col("content_arr").as("sec_contents"))
        .filter(col("s2") >= 30)

      val gc = a1.join(a2, col("profile") === col("profile2") &&
          col("primary_genre") =!= col("secondary_genre"))
        .select(col("profile"), col("primary_genre"), col("secondary_genre"),
          (col("s1") * col("s2")).as("compatibility_score"),
          size(array_intersect(col("d1"), col("d2"))).cast("long").as("co_viewing_days"),
          col("sec_contents"))

      val gn = gc.groupBy(col("primary_genre"), col("secondary_genre"))
        .agg(
          count(lit(1)).as("user_count"),
          sort_array(collect_list(col("compatibility_score"))).as("cs_arr"),
          (sum(col("co_viewing_days")).cast("double") / count(lit(1)))
            .as("avg_co_viewing_days"))
        .filter(col("user_count") >= 2)
        .withColumn("avg_compatibility",
          aggregate(col("cs_arr"), lit(0.0), (a, x) => a + x) /
            col("user_count").cast("double"))
        .drop("cs_arr")

      val watched = gc
        .select(col("primary_genre"), col("secondary_genre"),
          explode(col("sec_contents")).as("c"))
        .distinct()
        .groupBy(col("primary_genre").as("wg1"), col("secondary_genre").as("wg2"))
        .agg(count(lit(1)).as("watched_sec_contents"))

      val gt = t.part
        .groupBy(genreOf(col("p_brand")).as("gt_genre"))
        .agg(count(lit(1)).as("genre_contents"))

      val qual = af.filter(col("genre_affinity_score") >= 32)
        .groupBy(col("genre").as("q_genre"))
        .agg(count(lit(1)).as("qualifying_users"))

      gn
        .join(broadcast(watched), col("wg1") === col("primary_genre") &&
          col("wg2") === col("secondary_genre"))
        .join(broadcast(gt), col("gt_genre") === col("secondary_genre"))
        .join(broadcast(qual), col("q_genre") === col("primary_genre"))
        .withColumn("relationship_strength",
          col("user_count").cast("double") * 0.5 + col("avg_compatibility") * 0.3 +
            col("avg_co_viewing_days") * 0.2)
        .withColumn("potential_cross_genre_content",
          col("genre_contents") - col("watched_sec_contents"))
        .withColumn("opportunity_score",
          col("relationship_strength") * col("qualifying_users").cast("double") * 0.0001)
        .select(col("primary_genre"), col("secondary_genre"), col("user_count"),
          col("avg_compatibility"), col("avg_co_viewing_days"),
          col("relationship_strength"), col("potential_cross_genre_content"),
          col("opportunity_score"))
        .orderBy(col("relationship_strength").desc, col("opportunity_score").desc,
          col("primary_genre"), col("secondary_genre"))
    }
  }

  val q63: Q = q63For(defaultAsOf, defaultLookbackDays)

  def all: Seq[Q] = Seq(q63)
}
