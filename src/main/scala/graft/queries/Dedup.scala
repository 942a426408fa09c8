package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.{Dedup => D, Similarity}
import graft.functions.vec

/** Deduplication queries over documents/embeddings (SURVEY.md §2
  * q40–q44) — the training-corpus dedup tier the brief requires beyond
  * the reference's own surface.
  *
  * q40 and q43 have exact DuckDB oracles (q43's oracle is the O(n²)
  * jaccard ground truth — the LSH plan must reproduce it exactly, which
  * it does because 16 bands × 2 rows keeps collision probability ≈ 1
  * for jaccard ≥ 0.8). q41/q42/q44 are rows-only LSH candidate
  * surfaces, spec-verified against planted near-dups / brute force in
  * DedupSpec.
  */
object Dedup {

  /** q40: exact dedup by content hash — per-source input vs survivor
    * counts. One shuffle on md5(text).
    */
  val q40 = Q.of(
    "q40_dedup_exact",
    """WITH kept AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM documents
      |  ) WHERE rn = 1
      |), kc AS (SELECT source, COUNT(*) AS n_kept FROM kept GROUP BY source),
      |ic AS (SELECT source, COUNT(*) AS n_input, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |       FROM documents GROUP BY source)
      |SELECT ic.source, n_input, n_kept, total_chars
      |FROM ic JOIN kc ON ic.source = kc.source
      |ORDER BY ic.source""".stripMargin) { t =>
    val kept = D.exactByContent(t.documents, "text", "doc_id")
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    t.documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_input"), sum(col("n_chars")).as("total_chars"))
      .join(kept, "source")
      .select(col("source"), col("n_input"), col("n_kept"), col("total_chars"))
      .orderBy(col("source"))
  }

  /** q41: MinHash+LSH near-dup candidate pairs (est. jaccard from
    * 32-hash signatures, 8 bands × 4 rows — the candidate surface can
    * afford r=4, which collapses the random-collision volume on this
    * high-baseline-similarity corpus ~100× while keeping recall ≈ 1
    * for the j ≥ 0.9 planted pairs; q43, whose oracle demands exact
    * recall down to j = 0.8, uses the safer 16×2 banding). Rows-only —
    * DedupSpec checks the planted ≥0.8-jaccard pairs are all recovered.
    */
  val q41 = Q.rowsOnly("q41_dedup_minhash") { t =>
    val sigs = D.withMinHashFromText(t.documents, "text", n = 5, numHashes = 32)
    D.minHashCandidates(sigs, "doc_id", bands = 8, rowsPerBand = 4)
      .filter(col("est_jaccard") >= 0.5)
      .withColumn("est_jaccard", round(col("est_jaccard"), 4))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q42: SimHash hamming-bucket near-dups (64-bit signature, 4×16-bit
    * bands, Hamming ≤ 6). Rows-only — spec checks planted pairs.
    */
  val q42 = Q.rowsOnly("q42_dedup_simhash") { t =>
    D.simHashCandidates(D.withSimHash(t.documents, "text"), "doc_id", maxHamming = 6)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q43: exact n-gram Jaccard verify over LSH candidates. The oracle
    * is the brute-force ground truth — the bucketed plan must find
    * every pair with jaccard ≥ 0.8 while joining only within buckets.
    * Banding is 16 bands × 4 rows over a 64-hash signature:
    * P(no band collision | j) = (1-j⁴)^16 — 2e-4 at exactly j=0.8,
    * 7e-6 at 0.85, ~0 at the ≥0.95 jaccard real near-dups carry —
    * while a random same-vocabulary pair (j≈0.15) collides with
    * p≈0.8%, keeping the candidate volume ~60× below the 16×2
    * banding that a tighter guarantee would need.
    */
  val q43 = Q.of(
    "q43_dedup_ngram_jaccard",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 1), 1),
      |                                 i -> substr(text, i, 5))) AS s
      |  FROM documents
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin) { t =>
    D.nearDupPairs(t.documents, "doc_id", "text", n = 5, minJaccard = 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q44: embedding-cosine near-dup pairs via hyperplane LSH buckets
    * with exact cosine verify ≥ 0.4. Rows-only — approximate by
    * design; DedupSpec measures recall vs brute force.
    *
    * Banding is 16 tables × AUTO bits ([[Similarity.autoBitsPerTable]]
    * — bits grows with log₂(n), §5's rule): the ≤500-vector spec SFs
    * resolve to the original 4 bits (per-table collision ~0.16 at
    * cos 0.4 → ~0.94 recall over 16 tables, the level DedupSpec
    * floors), sf0.1's 2000 vectors get 5 bits (~0.88), and the
    * sf1 decade grows to 9 bits, holding candidate volume LINEAR
    * (fixed 4 bits measured 54× time for 10× vectors — Σ bucket² =
    * n²/16). Near-dup-band pairs (cos ≥ 0.9, per-bit agreement 0.856)
    * keep recall ≈ 0.99 at 9 bits; only distant-pair recall decays,
    * the documented trade (grow `tables` to hold a low threshold too).
    */
  /** q45: near-dup cluster RESOLUTION — the step that actually shrinks
    * a corpus (every LSH surface above stops at pairs). jaccard ≥ 0.8
    * pairs (q43's exact-verified set) → connected components via
    * [[graft.operators.Components]] min-label propagation with pointer
    * jumping → lowest-id survivor per component → per-source input /
    * kept / dropped counts. The oracle recomputes the same components
    * in DuckDB with a WITH RECURSIVE transitive closure over the
    * brute-force pair set, so the distributed O(log diameter) loop is
    * gated against an exact sequential ground truth.
    */
  val q45 = Q.of(
    "q45_dedup_resolve",
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 1), 1),
      |                                 i -> substr(text, i, 5))) AS s
      |  FROM documents
      |), pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
      |), edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs
      |), walk(id, reach) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
      |), comp AS (
      |  SELECT id AS doc_id, MIN(reach) AS mn FROM walk GROUP BY id
      |), lab AS (
      |  SELECT d.doc_id, d.source,
      |    CASE WHEN c.mn IS NULL OR d.doc_id < c.mn THEN d.doc_id ELSE c.mn END AS component
      |  FROM documents d LEFT JOIN comp c USING (doc_id)
      |)
      |SELECT source, COUNT(*) AS n_input,
      |  CAST(SUM(CASE WHEN doc_id = component THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN doc_id <> component THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
      |FROM lab GROUP BY source
      |ORDER BY source""".stripMargin) { t =>
    import graft.operators.Components
    val pairs = D.nearDupPairs(t.documents, "doc_id", "text", n = 5, minJaccard = 0.8)
    val labels = Components.label(pairs, "doc_a", "doc_b")
    t.documents.select(col("doc_id"), col("source"))
      .join(labels.select(col("id").as("doc_id"), col("label")), Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("label"), col("doc_id")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_input"),
        sum(when(col("doc_id") === col("component"), 1).otherwise(0)).as("n_kept"),
        sum(when(col("doc_id") =!= col("component"), 1).otherwise(0)).as("n_dropped"))
      .orderBy(col("source"))
  }

  /** q112: INCREMENTAL dedup — the daily-increment loop
    * ([[graft.operators.Dedup.incrementalReport]]): the DELTA batch
    * (`doc_id % 5 = 0`, the day's ingest) near-dup-checked against the
    * full corpus with candidates keyed on DELTA bands only — base×base
    * pairs are never generated (yesterday's corpus is already clean;
    * re-deduping 100 TB against itself nightly is quadratic waste).
    * Disposition per delta doc: `dup_of_base` / `dup_within_delta` /
    * `new`, with verified-partner counts — the decision a curation
    * pipeline acts on (reject, intra-batch resolve, admit).
    *
    * The oracle is the O(n²) exact jaccard scan restricted to
    * delta-touching pairs + the same disposition rollup — the banded
    * delta-keyed plan must reproduce the brute-force answer exactly
    * (q43's gate, applied to the incremental shape). Output is
    * delta-grain: bounded by the day's batch, never the corpus.
    */
  val q112 = Q.of(
    "q112_incremental_dedup",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 1), 1),
      |                                 i -> substr(text, i, 5))) AS s
      |  FROM documents
      |), pr AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
      |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
      |), directed AS (
      |  SELECT da AS d, db AS p FROM pr UNION ALL SELECT db, da FROM pr
      |)
      |SELECT del.doc_id,
      |  CASE WHEN COALESCE(SUM(CASE WHEN p % 5 <> 0 THEN 1 ELSE 0 END), 0) > 0
      |         THEN 'dup_of_base'
      |       WHEN COALESCE(SUM(CASE WHEN p % 5 = 0 THEN 1 ELSE 0 END), 0) > 0
      |         THEN 'dup_within_delta'
      |       ELSE 'new' END AS verdict,
      |  CAST(COALESCE(SUM(CASE WHEN p % 5 <> 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_base_dups,
      |  CAST(COALESCE(SUM(CASE WHEN p % 5 = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_delta_dups
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) del
      |LEFT JOIN directed ON directed.d = del.doc_id
      |GROUP BY del.doc_id
      |ORDER BY del.doc_id""".stripMargin) { t =>
    D.incrementalReport(t.documents, "doc_id", "text",
      deltaCol = pmod(col("doc_id"), lit(5)) === 0, n = 5, minJaccard = 0.8)
      .orderBy(col("doc_id"))
  }

  val q44 = Q.rowsOnly("q44_dedup_embedding") { t =>
    val e = t.embeddings.select(col("vec_id"), vec.toDoubleArr(col("embedding")).as("v"))
    // one cheap count job (parquet metadata) sizes the banding for
    // whatever corpus this runs against
    val bits = Similarity.autoBitsPerTable(t.embeddings.count())
    Similarity.lshNearDupPairs(e, "vec_id", "v", tables = 16, bitsPerTable = bits, minCosine = 0.4)
      .withColumn("cos", round(col("cos"), 4))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  def all: Seq[Q] = Seq(q40, q41, q42, q43, q44, q45, q112)
}
