package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{AsOf, Q}
import graft.Dims.dimBroadcast
import graft.functions.det._

/** q68: the seventeenth full reference analysis end-to-end — Content
  * Production ROI (/root/reference/SQL/Content Production ROI
  * Analysis.txt:1-170; pyspark twin) as one oracle-checked
  * composition: deterministic production costs → per-content
  * performance incl. the ATTRIBUTED-SUBSCRIPTIONS temporal EXISTS
  * (users who signed up within 30 days of the content's catalog-add
  * AND first viewed it within 7 days of signup — the reference's
  * doubly-correlated subquery at :30-41) → financial metrics (premium
  * rate-card VALUES relation, engagement revenue, total cost) → ROI +
  * break-even + success ladder → per-(genre, type, category, country)
  * production patterns with HAVING >= 5 → investment recommendation →
  * the two correlated output subqueries (successful-production
  * profile, top-3 successful actors).
  *
  * Reference → testdata mapping (SURVEY §3): content→part (genre =
  * brand number mod 5 per q63, content_type = first word of p_type,
  * duration→p_size, imdb_rating→(content_id mod 56)/10+3.5 per q67),
  * viewing_history→lineitem⋈orders (viewer = o_custkey so viewers
  * have a signup stream; watch time = l_quantity·100 minutes;
  * completion = (1−l_discount)·100), users→customer with signup_date
  * = first order date (the q68 attribution clock), content_category =
  * content_id mod 3 → Original/Licensed/Co-production,
  * production_country = 'C' + content_id mod 2 (two production
  * countries keep the reference's HAVING >= 5 populated down to
  * sf0.001's 195-content window), added_date =
  * content's first stream in the window (q59's data-derived
  * catalog-add). The hypothetical production_costs table becomes
  * deterministic columns (production_budget = retailprice·0.05,
  * marketing_budget = size·1.0 — the q58/q67 deterministic-cost rule
  * RESCALED to testdata magnitude: the reference's $M budgets against
  * ~4 viewers/content would put every cell in 'Underperforming' and
  * the entire ladder dead; at 0.05/1.0 all four success categories
  * and all four recommendation branches populate at the gate SF). The
  * content_actors/actors tables become the supplier bridge: DISTINCT
  * (l_partkey, l_suppkey) of the windowed fact with actor_name =
  * s_name.
  *
  * Deviations (documented): (a) days_to_break_even — the reference's
  * correlated subquery (:56-66) is structurally degenerate: its
  * predicate does not reference the subquery row, so it reduces to
  * DATEDIFF(min_start, min_start) = 0-or-NULL. Re-designed to the
  * real break-even: the first day the cumulative engagement value
  * (running per-day watch-minutes × $0.01) plus the upfront
  * subscription revenue crosses total cost, as days since
  * catalog-add — a q07 running-total window + conditional min over
  * the same content clustering. (b) the 'Increase Investment'
  * volatility cutpoint 50→200: ROI% dispersion at this scale sits at
  * 100-170, so the reference's <50 arm is vacuous against this data
  * (q66's re-band-to-measured-quantiles rule). (c) the
  * successful-production-profile correlated LIMIT 1 (:122-131) groups
  * by exactly its correlation key, so LIMIT 1 IS the group row — it
  * collapses to a per-(genre, type) aggregate broadcast back; its
  * ROUND()-into-string formatting is re-expressed in integer
  * arithmetic (floor(x+0.5), explicit tenths digit) because
  * cross-engine float→string formatting is not bit-stable. (d) the
  * budget figure drops the reference's /1M scaling (budgets are
  * already testdata-scale dollars). HAVING >= 5 and the top-3
  * actors' HAVING >= 2 contents are kept verbatim.
  *
  * Plan shape at scale: ONE windowed fact scan; the l⋈o equi-join on
  * orderkey is the only fact⋈fact exchange; signup (per-customer
  * first order) rides dimBroadcast; the added_date window puts the
  * frame on ONE l_partkey exchange that every downstream aggregate —
  * per-(content, user) attribution, per-content roll-up, per-day
  * break-even cumsum + crossing, and the actor bridge distinct —
  * reuses without reshuffling (subset clustering). The per-content
  * frame and the roi frame are cached; patterns/profile/actor frames
  * are cell-sized and broadcast back onto them.
  */
object Roi {

  val defaultAsOf: AsOf = AsOf("1996-01-01")
  val defaultLookbackDays = 365

  def q68For(asOf: AsOf, lookbackDays: Int): Q = {
    val start = asOf.minusDays(lookbackDays)

    Q.of(
      "q68_production_roi",
      s"""WITH sv AS (
        |  SELECT CAST(avg(monthly_value) AS DOUBLE) AS premium_value
        |  FROM (VALUES ('basic', 7.99), ('standard', 11.99), ('premium', 15.99)) AS t(subscription_type, monthly_value)
        |  WHERE subscription_type = 'premium'
        |), signup AS (
        |  SELECT o_custkey, min(o_orderdate) AS signup_date FROM orders
        |  WHERE o_orderdate <= ${asOf.sqlTs} GROUP BY 1
        |), va AS (
        |  SELECT l.l_partkey AS content_id, l.l_suppkey AS actor_id, o.o_custkey AS user_id,
        |    l.l_shipdate AS view_ts,
        |    CAST(l.l_quantity * 100 AS DOUBLE) AS watch_minutes,
        |    CAST((1.0 - l.l_discount) * 100 AS DOUBLE) AS completion,
        |    s.signup_date,
        |    min(l.l_shipdate) OVER (PARTITION BY l.l_partkey) AS added_date
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN signup s ON s.o_custkey = o.o_custkey
        |  WHERE l.l_shipdate > ${start.sqlTs} AND l.l_shipdate <= ${asOf.sqlTs}
        |), pcu AS (
        |  SELECT content_id, user_id, max(added_date) AS added_date, max(signup_date) AS signup_date,
        |    count(*) AS nviews,
        |    SUM(CAST(watch_minutes AS DECIMAL(20,6))) AS mins_sum,
        |    SUM(CAST(completion AS DECIMAL(20,6))) AS comp_sum,
        |    max(CASE WHEN view_ts >= signup_date AND view_ts <= signup_date + INTERVAL 7 DAY THEN 1 ELSE 0 END) AS viewed_7d
        |  FROM va GROUP BY 1, 2
        |), cp AS (
        |  SELECT content_id, max(added_date) AS added_date,
        |    CAST(count(*) AS BIGINT) AS total_viewers,
        |    CAST(SUM(nviews) AS BIGINT) AS total_views,
        |    CAST(SUM(comp_sum) AS DOUBLE) / SUM(nviews) AS avg_completion,
        |    CAST(SUM(mins_sum) AS DOUBLE) AS total_watch_minutes,
        |    CAST(count(CASE WHEN signup_date >= added_date AND signup_date <= added_date + INTERVAL 30 DAY
        |                     AND viewed_7d = 1 THEN 1 END) AS BIGINT) AS attributed_subscriptions
        |  FROM pcu GROUP BY 1
        |), pday AS (
        |  SELECT content_id, CAST(view_ts AS DATE) AS d, SUM(CAST(watch_minutes AS DECIMAL(20,6))) AS mins
        |  FROM va GROUP BY 1, 2
        |), pcum AS (
        |  SELECT content_id, d,
        |    CAST(SUM(mins) OVER (PARTITION BY content_id ORDER BY d) AS DOUBLE) AS cum_minutes
        |  FROM pday
        |), fin AS (
        |  SELECT cp.*,
        |    'G' || CAST(CAST(substr(p.p_brand, 7) AS BIGINT) % 5 AS VARCHAR) AS genre,
        |    split_part(p.p_type, ' ', 1) AS content_type,
        |    CASE p.p_partkey % 3 WHEN 0 THEN 'Original' WHEN 1 THEN 'Licensed' ELSE 'Co-production' END AS content_category,
        |    'C' || CAST(p.p_partkey % 2 AS VARCHAR) AS production_country,
        |    CAST(p.p_size AS DOUBLE) AS duration_minutes,
        |    CAST(p.p_partkey % 56 AS DOUBLE) / CAST(10 AS DOUBLE) + CAST(3.5 AS DOUBLE) AS imdb_rating,
        |    CAST(p.p_retailprice AS DOUBLE) * 0.05 AS production_budget,
        |    CAST(cp.attributed_subscriptions AS DOUBLE) * sv.premium_value * 12 AS estimated_annual_revenue,
        |    cp.total_watch_minutes * 0.01 AS engagement_revenue,
        |    CAST(p.p_retailprice AS DOUBLE) * 0.05 + CAST(p.p_size AS DOUBLE) * 1.0 AS total_cost
        |  FROM cp JOIN part p ON p.p_partkey = cp.content_id CROSS JOIN sv
        |), be AS (
        |  SELECT f.content_id, min(pc.d) AS be_day
        |  FROM fin f JOIN pcum pc ON pc.content_id = f.content_id
        |  WHERE pc.cum_minutes * 0.01 + f.estimated_annual_revenue >= f.total_cost
        |  GROUP BY 1
        |), roi AS (
        |  SELECT f.*,
        |    f.estimated_annual_revenue + f.engagement_revenue - f.total_cost AS net_profit,
        |    (f.estimated_annual_revenue + f.engagement_revenue - f.total_cost) / f.total_cost * 100 AS roi_percentage,
        |    CASE WHEN (f.estimated_annual_revenue + f.engagement_revenue - f.total_cost) / f.total_cost * 100 > 100 THEN 'High Success'
        |         WHEN (f.estimated_annual_revenue + f.engagement_revenue - f.total_cost) / f.total_cost * 100 > 50 THEN 'Moderate Success'
        |         WHEN (f.estimated_annual_revenue + f.engagement_revenue - f.total_cost) / f.total_cost * 100 > 0 THEN 'Break Even'
        |         ELSE 'Underperforming' END AS success_category,
        |    CASE WHEN f.estimated_annual_revenue + f.engagement_revenue - f.total_cost >= 0
        |         THEN CAST(date_diff('day', CAST(f.added_date AS DATE), b.be_day) AS BIGINT) END AS days_to_break_even
        |  FROM fin f LEFT JOIN be b ON b.content_id = f.content_id
        |), pat AS (
        |  SELECT genre, content_type, content_category, production_country,
        |    CAST(count(*) AS BIGINT) AS productions_count,
        |    list_reduce(list_sort(list(roi_percentage)), (a, b) -> a + b) / CAST(count(*) AS DOUBLE) AS avg_roi,
        |    CASE WHEN count(days_to_break_even) > 0 THEN
        |      CAST(CAST(SUM(days_to_break_even) AS BIGINT) AS DOUBLE) / count(days_to_break_even) END AS avg_break_even_days,
        |    CAST(SUM(CASE WHEN success_category = 'High Success' THEN 1 ELSE 0 END) AS DOUBLE) * 100 / count(*) AS high_success_rate,
        |    round(sqrt((CAST(count(*) AS DOUBLE) * CAST(SUM(CAST(roi_percentage * roi_percentage AS DECIMAL(28,6))) AS DOUBLE)
        |           - CAST(SUM(CAST(roi_percentage AS DECIMAL(28,6))) AS DOUBLE) * CAST(SUM(CAST(roi_percentage AS DECIMAL(28,6))) AS DOUBLE))
        |          / (CAST(count(*) AS DOUBLE) * (CAST(count(*) AS DOUBLE) - 1.0))), 4) AS roi_volatility,
        |    list_reduce(list_sort(list(CAST(total_viewers AS DOUBLE) / total_cost * 1000)), (a, b) -> a + b)
        |      / CAST(count(*) AS DOUBLE) AS viewers_per_thousand_dollars
        |  FROM roi GROUP BY 1, 2, 3, 4 HAVING count(*) >= 5
        |), ps AS (
        |  SELECT genre, content_type,
        |    list_reduce(list_sort(list(production_budget)), (a, b) -> a + b) / CAST(count(*) AS DOUBLE) AS ab,
        |    list_reduce(list_sort(list(duration_minutes)), (a, b) -> a + b) / CAST(count(*) AS DOUBLE) AS ad,
        |    list_reduce(list_sort(list(imdb_rating)), (a, b) -> a + b) / CAST(count(*) AS DOUBLE) AS ar
        |  FROM roi WHERE success_category = 'High Success' GROUP BY 1, 2
        |), psf AS (
        |  SELECT genre, content_type,
        |    'Budget: $$' || CAST(CAST(floor(ab + 0.5) AS BIGINT) AS VARCHAR) ||
        |    ', Duration: ' || CAST(CAST(floor(ad + 0.5) AS BIGINT) AS VARCHAR) ||
        |    'min, Rating: ' || CAST(CAST(floor(ar * 10 + 0.5) AS BIGINT) // 10 AS VARCHAR) || '.' ||
        |    CAST(CAST(floor(ar * 10 + 0.5) AS BIGINT) % 10 AS VARCHAR) AS successful_production_profile
        |  FROM ps
        |), bridge AS (
        |  SELECT DISTINCT content_id, actor_id FROM va
        |), hsb AS (
        |  SELECT r.genre, r.content_type, b.actor_id, count(DISTINCT b.content_id) AS nc
        |  FROM roi r JOIN bridge b ON b.content_id = r.content_id
        |  WHERE r.success_category = 'High Success'
        |  GROUP BY 1, 2, 3 HAVING count(DISTINCT b.content_id) >= 2
        |), act AS (
        |  SELECT h.genre, h.content_type,
        |    array_to_string(list(s.s_name ORDER BY h.nc DESC, s.s_name)[1:3], ',') AS successful_actors
        |  FROM hsb h JOIN supplier s ON s.s_suppkey = h.actor_id GROUP BY 1, 2
        |)
        |SELECT p.genre, p.content_type, p.content_category, p.production_country,
        |  p.productions_count, p.avg_roi, p.avg_break_even_days, p.high_success_rate,
        |  p.roi_volatility, p.viewers_per_thousand_dollars,
        |  CASE WHEN p.avg_roi > 100 AND p.roi_volatility < 200 THEN 'Increase Investment'
        |       WHEN p.avg_roi > 50 AND p.high_success_rate > 30 THEN 'Maintain Investment'
        |       WHEN p.avg_roi < 0 AND p.high_success_rate < 10 THEN 'Reduce Investment'
        |       ELSE 'Further Analysis Required' END AS investment_recommendation,
        |  f.successful_production_profile, a.successful_actors
        |FROM pat p
        |LEFT JOIN psf f ON f.genre = p.genre AND f.content_type = p.content_type
        |LEFT JOIN act a ON a.genre = p.genre AND a.content_type = p.content_type
        |ORDER BY p.avg_roi DESC, p.genre, p.content_type, p.content_category, p.production_country""".stripMargin) { t =>
      val spark = t.spark
      import spark.implicits._

      // premium rate-card VALUES relation → one-row broadcast scalar
      val sv = Seq(("basic", 7.99), ("standard", 11.99), ("premium", 15.99))
        .toDF("subscription_type", "monthly_value")
        .filter($"subscription_type" === "premium")
        .agg(avg($"monthly_value").cast("double").as("premium_value"))

      val signup = t.orders.filter(col("o_orderdate") <= asOf.tsLit)
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("signup_date"))

      val winAdded = Window.partitionBy(col("content_id"))
      val va = graft.CacheScope.trackedCache(t.lineitem
        .filter(col("l_shipdate") > start.tsLit && col("l_shipdate") <= asOf.tsLit)
        .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .join(dimBroadcast(signup), Seq("o_custkey"))
        .select(
          col("l_partkey").as("content_id"),
          col("l_suppkey").as("actor_id"),
          col("o_custkey").as("user_id"),
          col("l_shipdate").as("view_ts"),
          (col("l_quantity") * 100).cast("double").as("watch_minutes"),
          ((lit(1.0) - col("l_discount")) * 100).cast("double").as("completion"),
          col("signup_date"))
        .withColumn("added_date", min(col("view_ts")).over(winAdded)))

      val pcu = va.groupBy(col("content_id"), col("user_id"))
        .agg(
          max(col("added_date")).as("added_date"),
          max(col("signup_date")).as("signup_date"),
          count(lit(1)).as("nviews"),
          sum(col("watch_minutes").cast(D20_6)).as("mins_sum"),
          sum(col("completion").cast(D20_6)).as("comp_sum"),
          max(when(col("view_ts") >= col("signup_date") &&
            col("view_ts") <= col("signup_date") + expr("INTERVAL 7 DAY"), 1)
            .otherwise(0)).as("viewed_7d"))

      val cp = pcu.groupBy(col("content_id"))
        .agg(
          max(col("added_date")).as("added_date"),
          count(lit(1)).cast("long").as("total_viewers"),
          sum(col("nviews")).cast("long").as("total_views"),
          (sum(col("comp_sum")).cast("double") / sum(col("nviews"))).as("avg_completion"),
          sum(col("mins_sum")).cast("double").as("total_watch_minutes"),
          count(when(col("signup_date") >= col("added_date") &&
            col("signup_date") <= col("added_date") + expr("INTERVAL 30 DAY") &&
            col("viewed_7d") === 1, 1)).cast("long").as("attributed_subscriptions"))

      val pcum = va.groupBy(col("content_id"), to_date(col("view_ts")).as("d"))
        .agg(sum(col("watch_minutes").cast(D20_6)).as("mins"))
        .withColumn("cum_minutes",
          sum(col("mins")).over(Window.partitionBy(col("content_id"))
            .orderBy(col("d"))).cast("double"))
        .select(col("content_id"), col("d"), col("cum_minutes"))

      val partDim = t.part.select(col("p_partkey"),
        concat(lit("G"), (substring(col("p_brand"), 7, 10).cast("long") % 5).cast("string"))
          .as("genre"),
        split(col("p_type"), " ").getItem(0).as("content_type"),
        when(col("p_partkey") % 3 === 0, "Original")
          .when(col("p_partkey") % 3 === 1, "Licensed")
          .otherwise("Co-production").as("content_category"),
        concat(lit("C"), (col("p_partkey") % 2).cast("string")).as("production_country"),
        col("p_size").cast("double").as("duration_minutes"),
        (col("p_retailprice").cast("double") * 0.05).as("production_budget"),
        (col("p_retailprice").cast("double") * 0.05 + col("p_size").cast("double") * 1.0)
          .as("total_cost"))

      val fin = graft.CacheScope.trackedCache(cp
        .join(dimBroadcast(partDim), col("p_partkey") === col("content_id"))
        .crossJoin(broadcast(sv))
        .withColumn("imdb_rating",
          (col("content_id") % 56).cast("double") / lit(10).cast("double") +
            lit(3.5).cast("double"))
        .withColumn("estimated_annual_revenue",
          col("attributed_subscriptions").cast("double") * col("premium_value") * 12)
        .withColumn("engagement_revenue", col("total_watch_minutes") * 0.01)
        .drop("p_partkey", "premium_value"))

      val be = fin.select(col("content_id"),
        col("estimated_annual_revenue"), col("total_cost"))
        .join(pcum, Seq("content_id"))
        .filter(col("cum_minutes") * 0.01 + col("estimated_annual_revenue") >= col("total_cost"))
        .groupBy(col("content_id"))
        .agg(min(col("d")).as("be_day"))

      val netProfit = col("estimated_annual_revenue") + col("engagement_revenue") - col("total_cost")
      val roiPct = netProfit / col("total_cost") * 100
      val roi = graft.CacheScope.trackedCache(fin
        .join(be, Seq("content_id"), "left")
        .withColumn("net_profit", netProfit)
        .withColumn("roi_percentage", roiPct)
        .withColumn("success_category",
          when(roiPct > 100, "High Success")
            .when(roiPct > 50, "Moderate Success")
            .when(roiPct > 0, "Break Even")
            .otherwise("Underperforming"))
        .withColumn("days_to_break_even",
          when(netProfit >= 0,
            datediff(col("be_day"), to_date(col("added_date"))).cast("long"))))

      def leftFoldAvg(c: org.apache.spark.sql.Column) =
        aggregate(sort_array(collect_list(c)), lit(0.0), (a, x) => a + x) /
          count(lit(1)).cast("double")

      val n = count(lit(1)).cast("double")
      val sx = dsumw(col("roi_percentage"))
      val sxx = dsumw(col("roi_percentage") * col("roi_percentage"))
      val pat = roi.groupBy(col("genre"), col("content_type"),
        col("content_category"), col("production_country"))
        .agg(
          count(lit(1)).cast("long").as("productions_count"),
          leftFoldAvg(col("roi_percentage")).as("avg_roi"),
          when(count(col("days_to_break_even")) > 0,
            sum(col("days_to_break_even")).cast("long").cast("double") /
              count(col("days_to_break_even"))).as("avg_break_even_days"),
          (sum(when(col("success_category") === "High Success", 1).otherwise(0))
            .cast("double") * 100 / count(lit(1))).as("high_success_rate"),
          // n=1 groups are dropped by the HAVING below, but ANSI mode
          // evaluates the n(n-1) denominator before the filter runs
          when(count(lit(1)) > 1,
            round(sqrt((n * sxx - sx * sx) / (n * (n - lit(1.0)))), 4)).as("roi_volatility"),
          leftFoldAvg(col("total_viewers").cast("double") / col("total_cost") * 1000)
            .as("viewers_per_thousand_dollars"))
        .filter(col("productions_count") >= 5)

      val ps = roi.filter(col("success_category") === "High Success")
        .groupBy(col("genre"), col("content_type"))
        .agg(
          leftFoldAvg(col("production_budget")).as("ab"),
          leftFoldAvg(col("duration_minutes")).as("ad"),
          leftFoldAvg(col("imdb_rating")).as("ar"))
      val rTenths = floor(col("ar") * 10 + 0.5).cast("long")
      val psf = ps.select(col("genre"), col("content_type"),
        concat(
          lit("Budget: $"), floor(col("ab") + 0.5).cast("long").cast("string"),
          lit(", Duration: "), floor(col("ad") + 0.5).cast("long").cast("string"),
          lit("min, Rating: "), (rTenths / 10).cast("long").cast("string"),
          lit("."), (rTenths % 10).cast("string"))
          .as("successful_production_profile"))

      val bridge = va.select(col("content_id"), col("actor_id")).distinct()
      val hsb = roi.filter(col("success_category") === "High Success")
        .select(col("content_id"), col("genre"), col("content_type"))
        .join(bridge, Seq("content_id"))
        .groupBy(col("genre"), col("content_type"), col("actor_id"))
        .agg(countDistinct(col("content_id")).as("nc"))
        .filter(col("nc") >= 2)
      val act = hsb
        .join(dimBroadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === col("actor_id"))
        .groupBy(col("genre"), col("content_type"))
        .agg(sort_array(collect_list(struct((-col("nc")).as("negn"), col("s_name").as("nm"))))
          .as("arr"))
        .select(col("genre"), col("content_type"),
          array_join(slice(transform(col("arr"), x => x.getField("nm")), 1, 3), ",")
            .as("successful_actors"))

      pat
        .join(broadcast(psf), Seq("genre", "content_type"), "left")
        .join(broadcast(act), Seq("genre", "content_type"), "left")
        .withColumn("investment_recommendation",
          when(col("avg_roi") > 100 && col("roi_volatility") < 200, "Increase Investment")
            .when(col("avg_roi") > 50 && col("high_success_rate") > 30, "Maintain Investment")
            .when(col("avg_roi") < 0 && col("high_success_rate") < 10, "Reduce Investment")
            .otherwise("Further Analysis Required"))
        .select(col("genre"), col("content_type"), col("content_category"),
          col("production_country"), col("productions_count"), col("avg_roi"),
          col("avg_break_even_days"), col("high_success_rate"), col("roi_volatility"),
          col("viewers_per_thousand_dollars"), col("investment_recommendation"),
          col("successful_production_profile"), col("successful_actors"))
        .orderBy(col("avg_roi").desc, col("genre"), col("content_type"),
          col("content_category"), col("production_country"))
    }
  }

  val q68: Q = q68For(defaultAsOf, defaultLookbackDays)

  def all: Seq[Q] = Seq(q68)
}
