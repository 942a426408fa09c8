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
    import graft.operators.{Dedup => D, PrefixSum, Sampling}

    // the classifier fold (an md5 per distinct bigram) is the
    // pipeline's priciest projection and feeds FOUR branches
    // (boilerplate input, the anti-join, the funnel count, and
    // everything downstream) — materialize it once
    val keep1 = graft.CacheScope.trackedCache(Classifier
      .withRaw(t.documents.select(col("doc_id"), col("source"), col("text"), col("n_chars")))
      .filter(col("raw") > 0)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars")))

    // boilerplate verdicts computed WITHIN the classifier survivors.
    // keep2 has TWO consumers (the funnel count and the dedup stage),
    // and each re-runs the anti-join INPUT subtree — cache the tiny
    // verdict id frame so the 5-gram shingle + df window leg of
    // Boilerplate.profile runs once, not twice (guide §2.4)
    val boilerIds = graft.CacheScope.trackedCache(
      Boilerplate.profile(keep1.select(col("doc_id"), col("text")), k = 5)
        .filter(col("verdict") === "boilerplate")
        .select(col("doc_id")))
    val keep2 = keep1.join(boilerIds, Seq("doc_id"), "left_anti")

    // survivors feed the funnel count AND the sampling/packing tail
    val surv = graft.CacheScope.trackedCache(D.exactByContent(keep2, "text", "doc_id"))

    val samp = Sampling.mixtureSample(
      surv, col("source"), col("text"),
      rates = Seq("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25),
      defaultRate = 0.125)

    val packed = PrefixSum.orderedRunningSum(
        samp.select(col("source"), col("doc_id"), col("n_chars"),
          md5(col("text")).as("graft_h")),
        orderBy = Seq(col("graft_h"), col("doc_id")),
        value = col("n_chars"), outCol = "graft_run", numPartitions = 8)
      .withColumn("shard_id", expr("(graft_run - n_chars) div 20000"))

    def perSource(df: DataFrame, out: String): DataFrame =
      df.groupBy(col("source")).agg(count(lit(1)).as(out))

    t.documents.groupBy(col("source")).agg(count(lit(1)).as("n_input"))
      .join(perSource(keep1, "c1"), Seq("source"), "left")
      .join(perSource(keep2, "c2"), Seq("source"), "left")
      .join(perSource(surv, "c3"), Seq("source"), "left")
      .join(packed.groupBy(col("source")).agg(
          count(lit(1)).as("c4"),
          sum(col("n_chars")).cast("long").as("chars"),
          countDistinct(col("shard_id")).as("shards")),
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
