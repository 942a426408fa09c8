package graft.queries

import org.apache.spark.sql.functions._
import graft.{AsOf, Q}
import graft.Dims.dimBroadcast
import graft.functions.det._

/** q58: the ninth full reference analysis end-to-end — Infrastructure
  * Cost Optimization by Content Type (/root/reference/SQL/
  * Infrastructure Cost Optimization by Content Type.txt:1-150;
  * pyspark twin) as one oracle-checked composition: asOf-windowed
  * per-content streaming metrics (quality mix, geographic and device
  * spread) → the "hypothetical infrastructure costs table" as
  * deterministic per-content cost columns folded into the SAME
  * grouped pass (no join — the reference's sm⋈ic equi-join on
  * content_id collapses because every cost is a function of content
  * attributes carried through the grouping) → per-content efficiency
  * quotients → per-(type, genre, quality) cost aggregates with exact
  * PERCENTILE benchmarks (det.dpercentile: the linear interpolation
  * written as an explicit expression over a sorted array and
  * mirrored verbatim in the oracle SQL, so both engines run
  * identical IEEE operations — bit-exact with no rounding; q10's
  * round-to-4 compromise broke here on a 5-at-the-5th-decimal tie) →
  * optimization priority / cost-area / complexity ladders → savings,
  * ROI, and implementation timeline.
  *
  * Reference → testdata mapping (SURVEY §3): viewing_history→lineitem
  * in a 730-day asOf window (stream duration→l_quantity minutes,
  * stream quality→l_tax buckets >0.05 UHD / >0.02 HD / else SD,
  * device→l_returnflag, country→supplier nation), content→part
  * (content_type→first word of p_type, genre→brand family,
  * quality_tier→p_size thirds SD/HD/4K), costs→derived:
  * storage=retailprice·0.01, cdn=size·0.8,
  * transcoding=(key%7+1)·2.5. The priority cutpoints are
  * scale-free multiples of the group's own quartiles (avg vs
  * p75·0.87 / p25·1.3 — the reference's raw avg>p75 comparison is
  * empty on right-skewed groups) and the archive rule compares
  * streams to 9·content_count rather than an absolute count, so
  * every ladder branch fires at the gate SFs. The reference's final
  * correlated affected-count subquery equals the group's own
  * COUNT(*) by construction and is emitted as such.
  *
  * Plan shape at scale: ONE fact scan (shipdate window pushed) →
  * part and supplier dims broadcast → one exchange into the
  * per-content aggregate (distinct nation/device counts are
  * `size(collect_set)` — ≤25 and ≤3 elements, single phase, no
  * Expand) → the (type, genre, quality) rollup is ≤90 cells; exact
  * percentile state there scales with contents per cell (a dim, not
  * the fact — q10's bounded-group rule). Everything after the first
  * aggregate is cell-sized.
  */
object CostOpt {

  val defaultAsOf: AsOf = AsOf("2000-12-31")
  val defaultLookbackDays = 730

  def q58For(asOf: AsOf, lookbackDays: Int): Q = {
    val start = asOf.minusDays(lookbackDays)

    Q.of(
      "q58_cost_optimization",
      s"""WITH sm AS (
        |  SELECT l.l_partkey AS content_id,
        |    split_part(p.p_type, ' ', 1) AS content_type,
        |    substr(p.p_brand, 1, 7) AS genre,
        |    CASE WHEN p.p_size < 17 THEN 'SD' WHEN p.p_size < 34 THEN 'HD' ELSE '4K' END AS quality_tier,
        |    MAX(p.p_retailprice) AS p_retailprice, MAX(p.p_size) AS p_size,
        |    COUNT(*) AS total_streams,
        |    CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS total_stream_minutes,
        |    COUNT(CASE WHEN l.l_tax > 0.05 THEN 1 END) AS uhd_streams,
        |    COUNT(CASE WHEN l.l_tax > 0.02 AND l.l_tax <= 0.05 THEN 1 END) AS hd_streams,
        |    COUNT(CASE WHEN l.l_tax <= 0.02 THEN 1 END) AS sd_streams,
        |    COUNT(DISTINCT s.s_nationkey) AS countries_streamed,
        |    COUNT(DISTINCT l.l_returnflag) AS device_types
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  WHERE l.l_shipdate > ${start.sqlTs} AND l.l_shipdate <= ${asOf.sqlTs}
        |  GROUP BY 1, 2, 3, 4
        |), cca AS (
        |  SELECT *,
        |    CAST(p_retailprice AS DOUBLE) * 0.01 AS storage_cost_monthly,
        |    CAST(p_size AS DOUBLE) * 0.8 AS cdn_cost_monthly,
        |    CAST(content_id % 7 + 1 AS DOUBLE) * 2.5 AS transcoding_cost_monthly,
        |    CAST(p_retailprice AS DOUBLE) * 0.01 + CAST(p_size AS DOUBLE) * 0.8
        |      + CAST(content_id % 7 + 1 AS DOUBLE) * 2.5 AS total_cost_monthly
        |  FROM sm WHERE total_streams >= 5
        |), eff AS (
        |  SELECT *,
        |    CAST(total_streams AS DOUBLE) / GREATEST(total_cost_monthly, CAST(1 AS DOUBLE)) AS streams_per_dollar,
        |    total_cost_monthly / CAST(GREATEST(total_streams, 1) AS DOUBLE) AS cost_per_stream
        |  FROM cca
        |), coo AS (
        |  SELECT content_type, genre, quality_tier,
        |    COUNT(*) AS content_count,
        |    CAST(SUM(total_streams) AS BIGINT) AS total_streams,
        |    CAST(SUM(CAST(total_cost_monthly AS DECIMAL(20,6))) AS DOUBLE) AS total_monthly_cost,
        |    CAST(SUM(CAST(storage_cost_monthly AS DECIMAL(20,6))) AS DOUBLE) AS total_storage_cost,
        |    CAST(SUM(CAST(cdn_cost_monthly AS DECIMAL(20,6))) AS DOUBLE) AS total_cdn_cost,
        |    CAST(SUM(CAST(transcoding_cost_monthly AS DECIMAL(20,6))) AS DOUBLE) AS total_transcoding_cost,
        |    list_sort(list(cost_per_stream)) AS cps_arr,
        |    list_sort(list(streams_per_dollar)) AS spd_arr
        |  FROM eff GROUP BY 1, 2, 3
        |  HAVING COUNT(*) >= 2
        |), cooq AS (
        |  SELECT *,
        |    list_reduce(cps_arr, (a, b) -> a + b) / CAST(content_count AS DOUBLE) AS avg_cost_per_stream,
        |    list_reduce(spd_arr, (a, b) -> a + b) / CAST(content_count AS DOUBLE) AS avg_streams_per_dollar,
        |    cps_arr[1 + CAST(floor(0.25 * CAST(content_count - 1 AS DOUBLE)) AS INT)]
        |      + (cps_arr[1 + CAST(ceil(0.25 * CAST(content_count - 1 AS DOUBLE)) AS INT)]
        |         - cps_arr[1 + CAST(floor(0.25 * CAST(content_count - 1 AS DOUBLE)) AS INT)])
        |        * (0.25 * CAST(content_count - 1 AS DOUBLE) - floor(0.25 * CAST(content_count - 1 AS DOUBLE))) AS cost_per_stream_25p,
        |    cps_arr[1 + CAST(floor(0.75 * CAST(content_count - 1 AS DOUBLE)) AS INT)]
        |      + (cps_arr[1 + CAST(ceil(0.75 * CAST(content_count - 1 AS DOUBLE)) AS INT)]
        |         - cps_arr[1 + CAST(floor(0.75 * CAST(content_count - 1 AS DOUBLE)) AS INT)])
        |        * (0.75 * CAST(content_count - 1 AS DOUBLE) - floor(0.75 * CAST(content_count - 1 AS DOUBLE))) AS cost_per_stream_75p
        |  FROM coo
        |), orec AS (
        |  SELECT *,
        |    avg_cost_per_stream - cost_per_stream_25p AS cost_efficiency_gap,
        |    CASE WHEN avg_cost_per_stream > cost_per_stream_75p * 0.87 THEN 'High Priority'
        |         WHEN avg_cost_per_stream > cost_per_stream_25p * 1.3 THEN 'Medium Priority'
        |         ELSE 'Low Priority' END AS optimization_priority,
        |    CASE WHEN total_storage_cost > total_cdn_cost AND CAST(total_streams AS DOUBLE) < CAST(content_count AS DOUBLE) * 9 THEN 'Consider Archive: High storage cost for low streams'
        |         WHEN total_cdn_cost > total_storage_cost * 2 AND quality_tier = '4K' THEN 'Optimize UHD Delivery: High CDN costs'
        |         WHEN avg_streams_per_dollar < 0.2 THEN 'Review Encoding: Low streams per infrastructure dollar'
        |         ELSE 'Efficient: Monitor for changes' END AS cost_optimization_area,
        |    CASE WHEN content_type = 'STANDARD' AND quality_tier = '4K' THEN 'High Complexity'
        |         WHEN genre IN ('Brand#2', 'Brand#4') THEN 'Low Complexity'
        |         ELSE 'Medium Complexity' END AS implementation_complexity
        |  FROM cooq
        |), sav AS (
        |  SELECT *,
        |    CASE WHEN optimization_priority = 'High Priority' THEN total_monthly_cost * 0.25
        |         WHEN optimization_priority = 'Medium Priority' THEN total_monthly_cost * 0.15
        |         ELSE total_monthly_cost * 0.05 END AS potential_monthly_savings
        |  FROM orec
        |)
        |SELECT content_type, genre, quality_tier, total_monthly_cost, avg_cost_per_stream,
        |  cost_efficiency_gap, optimization_priority, cost_optimization_area,
        |  potential_monthly_savings, implementation_complexity,
        |  potential_monthly_savings * 12 /
        |    CASE WHEN implementation_complexity = 'High Complexity' THEN CAST(500 AS DOUBLE)
        |         WHEN implementation_complexity = 'Medium Complexity' THEN CAST(250 AS DOUBLE)
        |         ELSE CAST(100 AS DOUBLE) END AS estimated_roi_months,
        |  CASE WHEN optimization_priority = 'High Priority' AND implementation_complexity = 'Low Complexity' THEN 'Implement Immediately'
        |       WHEN optimization_priority = 'High Priority' THEN 'Plan Q1 Implementation'
        |       WHEN optimization_priority = 'Medium Priority' AND implementation_complexity = 'Low Complexity' THEN 'Plan Q2 Implementation'
        |       ELSE 'Monitor and Re-evaluate Next Quarter' END AS implementation_timeline,
        |  content_count AS affected_content_items
        |FROM sav
        |ORDER BY potential_monthly_savings DESC, optimization_priority DESC,
        |  content_type, genre, quality_tier""".stripMargin) { t =>
      val partDim = t.part.select(col("p_partkey"),
        split(col("p_type"), " ").getItem(0).as("content_type"),
        substring(col("p_brand"), 1, 7).as("genre"),
        when(col("p_size") < 17, "SD").when(col("p_size") < 34, "HD").otherwise("4K")
          .as("quality_tier"),
        col("p_retailprice"), col("p_size"))

      val sm = t.lineitem
        .filter(col("l_shipdate") > start.tsLit && col("l_shipdate") <= asOf.tsLit)
        .join(dimBroadcast(partDim), col("p_partkey") === col("l_partkey"))
        .join(dimBroadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))),
          col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("l_partkey").as("content_id"), col("content_type"), col("genre"),
          col("quality_tier"))
        .agg(
          max(col("p_retailprice")).as("p_retailprice"),
          max(col("p_size")).as("p_size"),
          count(lit(1)).as("total_streams"),
          dsum(col("l_quantity")).as("total_stream_minutes"),
          count(when(col("l_tax") > 0.05, lit(1))).as("uhd_streams"),
          count(when(col("l_tax") > 0.02 && col("l_tax") <= 0.05, lit(1))).as("hd_streams"),
          count(when(col("l_tax") <= 0.02, lit(1))).as("sd_streams"),
          size(collect_set(col("s_nationkey"))).cast("long").as("countries_streamed"),
          size(collect_set(col("l_returnflag"))).cast("long").as("device_types"))

      val storage = col("p_retailprice").cast("double") * 0.01
      val cdn = col("p_size").cast("double") * 0.8
      val transcoding = (col("content_id") % 7 + 1).cast("double") * 2.5
      val eff = sm.filter(col("total_streams") >= 5)
        .withColumn("storage_cost_monthly", storage)
        .withColumn("cdn_cost_monthly", cdn)
        .withColumn("transcoding_cost_monthly", transcoding)
        .withColumn("total_cost_monthly", storage + cdn + transcoding)
        .withColumn("streams_per_dollar",
          col("total_streams").cast("double") /
            greatest(col("total_cost_monthly"), lit(1).cast("double")))
        .withColumn("cost_per_stream",
          col("total_cost_monthly") / greatest(col("total_streams"), lit(1)).cast("double"))

      val coo = eff.groupBy(col("content_type"), col("genre"), col("quality_tier"))
        .agg(
          count(lit(1)).as("content_count"),
          sum(col("total_streams")).as("total_streams"),
          dsum(col("total_cost_monthly")).as("total_monthly_cost"),
          dsum(col("storage_cost_monthly")).as("total_storage_cost"),
          dsum(col("cdn_cost_monthly")).as("total_cdn_cost"),
          dsum(col("transcoding_cost_monthly")).as("total_transcoding_cost"),
          sort_array(collect_list(col("cost_per_stream"))).as("cps_arr"),
          sort_array(collect_list(col("streams_per_dollar"))).as("spd_arr"))
        .filter(col("content_count") >= 2)
        // exact left-fold sums over the sorted arrays: same IEEE op order as
        // the oracle's list_reduce, so the averages are bit-identical with no
        // double->decimal rounding (whose half-tie broke dsum here at sf0.1)
        .withColumn("avg_cost_per_stream",
          aggregate(col("cps_arr"), lit(0.0), (acc, x) => acc + x) /
            col("content_count").cast("double"))
        .withColumn("avg_streams_per_dollar",
          aggregate(col("spd_arr"), lit(0.0), (acc, x) => acc + x) /
            col("content_count").cast("double"))
        .withColumn("cost_per_stream_25p",
          dpercentile(col("cps_arr"), col("content_count"), 0.25))
        .withColumn("cost_per_stream_75p",
          dpercentile(col("cps_arr"), col("content_count"), 0.75))
        .drop("cps_arr", "spd_arr")

      val orec = coo
        .withColumn("cost_efficiency_gap",
          col("avg_cost_per_stream") - col("cost_per_stream_25p"))
        .withColumn("optimization_priority",
          when(col("avg_cost_per_stream") > col("cost_per_stream_75p") * 0.87,
            "High Priority")
            .when(col("avg_cost_per_stream") > col("cost_per_stream_25p") * 1.3,
              "Medium Priority")
            .otherwise("Low Priority"))
        .withColumn("cost_optimization_area",
          when(col("total_storage_cost") > col("total_cdn_cost") &&
            col("total_streams").cast("double") < col("content_count").cast("double") * 9,
            "Consider Archive: High storage cost for low streams")
            .when(col("total_cdn_cost") > col("total_storage_cost") * 2 &&
              col("quality_tier") === "4K", "Optimize UHD Delivery: High CDN costs")
            .when(col("avg_streams_per_dollar") < 0.2,
              "Review Encoding: Low streams per infrastructure dollar")
            .otherwise("Efficient: Monitor for changes"))
        .withColumn("implementation_complexity",
          when(col("content_type") === "STANDARD" && col("quality_tier") === "4K",
            "High Complexity")
            .when(col("genre").isin("Brand#2", "Brand#4"), "Low Complexity")
            .otherwise("Medium Complexity"))
        .withColumn("potential_monthly_savings",
          when(col("optimization_priority") === "High Priority",
            col("total_monthly_cost") * 0.25)
            .when(col("optimization_priority") === "Medium Priority",
              col("total_monthly_cost") * 0.15)
            .otherwise(col("total_monthly_cost") * 0.05))

      orec
        .select(col("content_type"), col("genre"), col("quality_tier"),
          col("total_monthly_cost"), col("avg_cost_per_stream"),
          col("cost_efficiency_gap"), col("optimization_priority"),
          col("cost_optimization_area"), col("potential_monthly_savings"),
          col("implementation_complexity"),
          (col("potential_monthly_savings") * 12 /
            when(col("implementation_complexity") === "High Complexity", lit(500).cast("double"))
              .when(col("implementation_complexity") === "Medium Complexity", lit(250).cast("double"))
              .otherwise(lit(100).cast("double"))).as("estimated_roi_months"),
          when(col("optimization_priority") === "High Priority" &&
            col("implementation_complexity") === "Low Complexity", "Implement Immediately")
            .when(col("optimization_priority") === "High Priority", "Plan Q1 Implementation")
            .when(col("optimization_priority") === "Medium Priority" &&
              col("implementation_complexity") === "Low Complexity", "Plan Q2 Implementation")
            .otherwise("Monitor and Re-evaluate Next Quarter").as("implementation_timeline"),
          col("content_count").as("affected_content_items"))
        .orderBy(col("potential_monthly_savings").desc, col("optimization_priority").desc,
          col("content_type"), col("genre"), col("quality_tier"))
    }
  }

  val q58: Q = q58For(defaultAsOf, defaultLookbackDays)

  def all: Seq[Q] = Seq(q58)
}
