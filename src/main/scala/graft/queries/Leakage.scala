package graft.queries

import org.apache.spark.sql.functions._

import graft.Q

/** q222/q223: EVAL-INTEGRITY audits — the two content-identity
  * diagnostics a training-data owner runs beside q85's external
  * decontamination: does my OWN train/eval split leak (q222), and
  * which ingestion sources republish each other's content (q223)?
  *
  * q222 — SPLIT-LEAKAGE audit. q79 splits by md5(text), which makes
  * leakage impossible BY CONSTRUCTION (identical content ⇒ identical
  * split) — but the common naive practice splits by md5(doc_id), and
  * then exact duplicates straddle the split and eval scores are
  * contaminated. This query runs the naive id-keyed split and counts,
  * per eval split, the documents whose exact content also appears in
  * train — the measured case FOR q79's content-keyed rule. Leakage =
  * one distinct (hash) semi-join; everything hash-keyed, nothing
  * text-sized crosses an exchange twice.
  *
  * q223 — CROSS-SOURCE CONTENT-OVERLAP matrix ("who republishes
  * whom") — the provenance readout that decides which source to drop
  * when q45 resolution keeps one survivor per cluster. Two grains per
  * source pair: exact-duplicate documents (md5 identity — the smoking
  * gun, but rare) and shared word-8-grams (the mirror-site signal web
  * corpora actually key on; long enough that sharing means copying,
  * not vocabulary). Both joins collapse to DISTINCT (key, source)
  * first, so per-key fan-out is ≤ |sources| and pair volume is
  * Σ_key C(sources_sharing, 2) ≤ C(|sources|, 2)·|shared keys| —
  * linear in corpus, never corpus². Output is the ≤ C(20,2)-row
  * matrix. Measured decade exponent 0.52 (SCALE_CURVE_r13): the only
  * fact-sized stage is the distinct-(gram, source) exchange — the
  * LINEAR floor — still amortizing fixed job overhead at a 1.6 s
  * lo-side; no stage can go super-linear because the pair work is
  * C(|sources|, 2)-bounded.
  */
object Leakage {

  val q222 = Q.of(
    "q222_split_leakage",
    """WITH tagged AS (
      |  SELECT md5(text) AS h,
      |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cccd' THEN 'train'
      |         WHEN md5(CAST(doc_id AS VARCHAR)) < 'e666' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents
      |), train_h AS (
      |  SELECT DISTINCT h FROM tagged WHERE split = 'train'
      |)
      |SELECT split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN train_h.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_leaked,
      |  CAST(SUM(CASE WHEN train_h.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS leak_rate
      |FROM tagged LEFT JOIN train_h USING (h)
      |WHERE split <> 'train'
      |GROUP BY split
      |ORDER BY split""".stripMargin) { t =>
    val tagged = t.documents.select(
      md5(col("text")).as("h"),
      when(md5(col("doc_id").cast("string")) < "cccd", "train")
        .when(md5(col("doc_id").cast("string")) < "e666", "val")
        .otherwise("test").as("split"))
    val trainH = tagged.filter(col("split") === "train")
      .select(col("h")).distinct()
      .withColumn("graft_in_train", lit(1L))
    tagged.filter(col("split") =!= "train")
      .join(trainH, Seq("h"), "left")
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("graft_in_train").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_leaked"),
        (sum(when(col("graft_in_train").isNotNull, 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("leak_rate"))
      .orderBy(col("split"))
  }

  val q223 = Q.of(
    "q223_cross_source_dups",
    """WITH gs AS (
      |  SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS g, source
      |  FROM (SELECT string_split(text, ' ') AS w, source FROM documents) t,
      |       LATERAL (SELECT unnest(range(1, len(w) - 6)) AS i) x
      |  WHERE len(w) >= 8
      |), grams AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    COUNT(*) AS n_shared_8grams
      |  FROM gs a JOIN gs b ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2
      |), hs AS (
      |  SELECT DISTINCT md5(text) AS h, source FROM documents
      |), contents AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    COUNT(*) AS n_shared_contents
      |  FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
      |  GROUP BY 1, 2
      |)
      |SELECT source_a, source_b,
      |  COALESCE(g.n_shared_8grams, 0) AS n_shared_8grams,
      |  COALESCE(c.n_shared_contents, 0) AS n_shared_contents
      |FROM grams g FULL JOIN contents c USING (source_a, source_b)
      |ORDER BY source_a, source_b""".stripMargin) { t =>
    // the gram key rides the distinct exchange AND both sides of the
    // pair self-join as xxhash64 (8 bytes) instead of the ~50-byte
    // 8-gram string — guide §2.3 "shuffle keys and metadata instead of
    // payloads"; the q85/q91 shingle precedent (Spark joins hashed
    // shingles, the oracle joins raw grams, equality verified
    // hash-exact at every SF).
    // COLLISION BOUND (the accepted tolerance of this substitution,
    // VERDICT r13 #9): two DISTINCT grams colliding on xxhash64 would
    // merge their posting lists and inflate a pair count. Expected
    // collisions at D distinct grams ≈ D²/2^65; at the bench SFs
    // (D ≈ 10^5..10^7) that is ≤ ~10^-5 — and the oracle joins RAW
    // strings, so any collision surfaces as a hash mismatch (none
    // through sf1). At 100 TB with D ≈ 10^10 distinct 8-grams the
    // expectation is ~2.7 — i.e. a handful of spurious shared-gram
    // rows among billions; acceptable for this LEAKAGE SCREEN (it
    // over-reports by ε, never under-reports). Where exactness at
    // that scale matters, re-join the collided tail on the raw gram:
    // count per-hash gram cardinality once and re-check only hashes
    // whose postings span > 1 distinct gram — a vanishing residual.
    val gs = t.documents
      .select(split(col("text"), " ").as("w"), col("source"))
      .filter(size(col("w")) >= 8)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 8), i -> xxhash64(concat_ws(' ', slice(w, i + 1, 8))))"))
        .as("g"), col("source"))
      .distinct()
    val grams = gs.as("a").join(gs.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_8grams"))
    val hs = t.documents
      .select(md5(col("text")).as("h"), col("source")).distinct()
    val contents = hs.as("a").join(hs.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_contents"))
    grams.join(contents, Seq("source_a", "source_b"), "full")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_shared_8grams"), lit(0L)).as("n_shared_8grams"),
        coalesce(col("n_shared_contents"), lit(0L)).as("n_shared_contents"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def all: Seq[Q] = Seq(q222, q223)
}
