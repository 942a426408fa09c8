package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q121: the ROUND-9 curation pipeline end to end — q38's composition
  * doctrine applied to the semantic-curation tier: classifier gate
  * (q117's exact-integer score) → boilerplate gate (q116's repeated-
  * n-gram profile, document frequency computed WITHIN the survivor
  * set, as a staged pipeline would) → exact dedup (q40's lowest-id
  * survivor per content hash) → mixture sampling (q113's per-source
  * md5 thresholds) → shard packing (q80's distributed prefix scan,
  * 20k-char budget) — reported as a per-source FUNNEL (input →
  * classifier-kept → non-boilerplate → unique → sampled) with the
  * sampled char mass and the number of shards each source's docs
  * landed in.
  *
  * Every stage is individually oracle-checked as its own §2 query;
  * this proves the COMPOSITION (the thing a user actually ships)
  * stays cross-engine exact: the whole funnel is deterministic — all
  * gates compare exact integers or md5 strings, dedup and packing are
  * content-addressed — so the pipeline has an exact DuckDB oracle end
  * to end. Plan economics inherit from the stages: the classifier
  * gate is a pure projection, the boilerplate stage ships 8-byte
  * hashes, dedup is one content-hash exchange, sampling is a filter,
  * and the pack runs on the bounded-driver-state prefix scan.
  */
object Pipeline {

  val q121 = Q.of(
    "q121_curation_end2end",
    """WITH f AS (
      |  SELECT doc_id, source, text, n_chars, string_split(text, ' ') AS w
      |  FROM documents
      |), cls AS (
      |  SELECT doc_id, source, text, n_chars, w,
      |    CAST(list_sum(list_transform(
      |      list_distinct(list_transform(range(1, len(w)),
      |        i -> array_to_string(w[i:i+1], ' '))),
      |      f -> CAST(('0x' || substr(md5(f), 1, 4)) AS BIGINT) - 32768)) AS BIGINT) AS raw
      |  FROM f WHERE len(w) >= 2
      |), keep1 AS (
      |  SELECT * FROM cls WHERE raw > 0
      |), sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 3),
      |    i -> array_to_string(w[i:i+4], ' ')))) AS s
      |  FROM keep1 WHERE len(w) >= 5
      |), dfq AS (
      |  SELECT doc_id, count(*) OVER (PARTITION BY s) AS dfreq FROM sh
      |), boiler AS (
      |  SELECT doc_id FROM dfq GROUP BY doc_id
      |  HAVING SUM(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) * 2 >= count(*)
      |), keep2 AS (
      |  SELECT * FROM keep1
      |  WHERE doc_id NOT IN (SELECT doc_id FROM boiler)
      |), surv AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM keep2
      |  ) WHERE rn = 1
      |), samp AS (
      |  SELECT * FROM surv
      |  WHERE CASE source
      |    WHEN 'src0' THEN TRUE
      |    WHEN 'src1' THEN md5(text) < 'c000'
      |    WHEN 'src2' THEN md5(text) < '8000'
      |    WHEN 'src3' THEN md5(text) < '4000'
      |    ELSE md5(text) < '2000' END
      |), packed AS (
      |  SELECT source, doc_id, n_chars,
      |    CAST((SUM(n_chars) OVER (ORDER BY md5(text), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars) // 20000 AS BIGINT) AS shard_id
      |  FROM samp
      |)
      |SELECT i.source, i.n_input,
      |  COALESCE(c1.n, 0) AS n_scored_keep,
      |  COALESCE(c2.n, 0) AS n_not_boiler,
      |  COALESCE(c3.n, 0) AS n_unique,
      |  COALESCE(c4.n, 0) AS n_sampled,
      |  CAST(COALESCE(c4.chars, 0) AS BIGINT) AS sampled_chars,
      |  COALESCE(c4.shards, 0) AS n_shards
      |FROM (SELECT source, count(*) AS n_input FROM documents GROUP BY source) i
      |LEFT JOIN (SELECT source, count(*) AS n FROM keep1 GROUP BY source) c1 USING (source)
      |LEFT JOIN (SELECT source, count(*) AS n FROM keep2 GROUP BY source) c2 USING (source)
      |LEFT JOIN (SELECT source, count(*) AS n FROM surv GROUP BY source) c3 USING (source)
      |LEFT JOIN (SELECT source, count(*) AS n, SUM(n_chars) AS chars,
      |             count(DISTINCT shard_id) AS shards
      |           FROM packed GROUP BY source) c4 USING (source)
      |ORDER BY i.source""".stripMargin) { t =>
    import graft.operators.PrefixSum

    // the classifier fold (an md5 per distinct bigram) is the
    // pipeline's priciest projection and feeds FOUR branches
    // (boilerplate input, the anti-join, the funnel count, and
    // everything downstream) — materialize it once
    val keep1 = graft.CacheScope.trackedCache(Classifier
      .withRaw(t.documents.select(col("doc_id"), col("source"), col("text"), col("n_chars")))
      .filter(col("raw") > 0)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars")))

    // boilerplate verdicts computed WITHIN the classifier survivors
    // (single consumer below — the flag join — so no cache needed)
    val boilerIds = Boilerplate.profile(
        keep1.select(col("doc_id"), col("text")), k = 5)
      .filter(col("verdict") === "boilerplate")
      .select(col("doc_id"), lit(1).as("graft_boiler"))

    // FUSED FUNNEL (VERDICT r13 #5): the staged spelling materialized
    // keep2 and surv as separate frames and rolled the funnel up with
    // FIVE per-stage groupBy+join legs (~12 small serialized stages).
    // Every stage past keep1 is a FLAG on a keep1 row — boilerplate
    // verdict (left join), dedup survivorship (the exactByContent
    // row_number, computed among non-boiler rows by sorting the
    // boiler flag FIRST within the content-hash partition: the rank-1
    // row is the lowest-id non-boiler doc exactly when one exists),
    // and the q113 mixture threshold on the same md5(text) — so ONE
    // flagged frame + ONE groupBy(source) yields c1..c4 and the char
    // mass, and only the shard count still needs the prefix-scan leg.
    // 5 joins → 2, 4 rollup passes → 2, sets per stage identical
    // (oracle unchanged).
    val sampleKeep = when(col("source") === "src0", lit(true))
      .when(col("source") === "src1", col("graft_h") < lit("c000"))
      .when(col("source") === "src2", col("graft_h") < lit("8000"))
      .when(col("source") === "src3", col("graft_h") < lit("4000"))
      .otherwise(col("graft_h") < lit("2000"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("graft_h")).orderBy(col("graft_boiler"), col("doc_id"))
    val flagged = graft.CacheScope.trackedCache(
      keep1
        .join(boilerIds, Seq("doc_id"), "left")
        .withColumn("graft_boiler", coalesce(col("graft_boiler"), lit(0)))
        .withColumn("graft_h", md5(col("text")))
        .withColumn("graft_rn", row_number().over(w))
        .withColumn("graft_surv",
          col("graft_boiler") === 0 && col("graft_rn") === 1)
        .withColumn("graft_samp", col("graft_surv") && sampleKeep)
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("graft_h"), col("graft_boiler"), col("graft_surv"),
          col("graft_samp")))

    val packed = PrefixSum.orderedRunningSum(
        flagged.filter(col("graft_samp"))
          .select(col("source"), col("doc_id"), col("n_chars"), col("graft_h")),
        orderBy = Seq(col("graft_h"), col("doc_id")),
        value = col("n_chars"), outCol = "graft_run", numPartitions = 8)
      .withColumn("shard_id", expr("(graft_run - n_chars) div 20000"))

    val funnel = flagged.groupBy(col("source")).agg(
      count(lit(1)).as("c1"),
      sum(when(col("graft_boiler") === 0, 1L).otherwise(0L)).as("c2"),
      sum(when(col("graft_surv"), 1L).otherwise(0L)).as("c3"),
      sum(when(col("graft_samp"), 1L).otherwise(0L)).as("c4"),
      sum(when(col("graft_samp"), col("n_chars")).otherwise(lit(0L)))
        .cast("long").as("chars"))

    t.documents.groupBy(col("source")).agg(count(lit(1)).as("n_input"))
      .join(funnel, Seq("source"), "left")
      .join(packed.groupBy(col("source"))
          .agg(countDistinct(col("shard_id")).as("shards")),
        Seq("source"), "left")
      .select(
        col("source"), col("n_input"),
        coalesce(col("c1"), lit(0L)).as("n_scored_keep"),
        coalesce(col("c2"), lit(0L)).as("n_not_boiler"),
        coalesce(col("c3"), lit(0L)).as("n_unique"),
        coalesce(col("c4"), lit(0L)).as("n_sampled"),
        coalesce(col("chars"), lit(0L)).as("sampled_chars"),
        coalesce(col("shards"), lit(0L)).as("n_shards"))
      .orderBy(col("source"))
  }

  def all: Seq[Q] = Seq(q121)
}
