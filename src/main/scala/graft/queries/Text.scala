package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextProfile

/** Text-analysis queries over the documents table (SURVEY.md §2
  * q30–q34) — the language-data half of the engine: token counting,
  * quality scoring, language ID, fingerprinting, n-gram profiles.
  *
  * All per-row counts (tokens, punctuation, stopword hits) come from
  * ONE fused pass over the text — the native
  * [[graft.functions.TextProfile]] expression with real codegen — so
  * the scan stage stays inside WholeStageCodegen and per-row cost is a
  * single O(n_chars) walk with zero allocation. The r3 composed form
  * ran eight `regexp_extract_all` calls per row, each materializing an
  * array of every match just to count it, and filter pushdown
  * duplicated those into the q38 gate predicates (~20 regex scans per
  * row, 2.6× the baseline pin). The ORACLES still use the regex form —
  * the correctness gate proves the fused pass reproduces the regex
  * semantics exactly; TextSpec additionally pins fused ≡ regex on
  * hostile inputs (multibyte, tabs, word-boundary edge cases).
  *
  * Oracle regex patterns are restricted to syntax with identical
  * semantics in Java regex (Spark) and RE2 (DuckDB): ASCII classes,
  * alternation, `\b`, `\S`. Counts are long to match DuckDB's BIGINT.
  */
object Text {

  /** q30: token counting — whitespace tokens and a BPE-ish pre-token
    * split (letter runs / digit runs / single punctuation), the shape a
    * tokenizer-budget estimator uses before real BPE.
    */
  val q30 = Q.of(
    "q30_token_count",
    """SELECT doc_id, n_chars,
      |  len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
      |  CAST(n_chars AS DOUBLE) / NULLIF(len(regexp_extract_all(text, '\S+')), 0) AS chars_per_token
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { t =>
    val p = TextProfile(col("text"))
    t.documents
      .select(col("doc_id"), col("n_chars"),
        p.getField("n_ws_tokens").as("n_ws_tokens"),
        p.getField("n_bpe_tokens").as("n_bpe_tokens"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / nullif(col("n_ws_tokens"), lit(0L)))
      .orderBy(col("doc_id"))
  }

  /** q31: quality scoring — length, punctuation ratio, stopword ratio,
    * combined into one bounded score (the pretraining-filter shape:
    * keep docs above a score threshold).
    *
    * The score is emitted UNROUNDED as the identical IEEE-double
    * expression on both sides (§6(i): round(x, 4) hit a 5th-decimal
    * half-tie at sf1 — 0.4932 vs 0.4933 — because DuckDB rounds
    * x·10⁴ in floating point while Spark rounds the decimal form;
    * §6(j): n_chars/500.0 is CAST to double in the oracle so DuckDB
    * doesn't route the quotient through exact DECIMAL arithmetic).
    * The unrounded form is a STRICTER cross-engine contract than the
    * rounded one — it requires both engines to evaluate this exact
    * expression left-to-right in IEEE doubles with double-typed
    * literals (holds today; the inputs are exact long/long
    * divisions). The early-warning pin for a DuckDB literal-typing
    * change is the sf1 gate: `tools/sf1_gate.sh` hash-compares q31 at
    * the decade every time it runs (ADVICE r7).
    */
  val q31 = Q.of(
    "q31_quality_score",
    """SELECT doc_id, n_tokens, punct_ratio, stop_ratio,
      |  least(1.0, CAST(n_chars AS DOUBLE)/500.0)*0.5 + (1.0-punct_ratio)*0.3 + least(1.0, stop_ratio*5.0)*0.2 AS quality
      |FROM (
      |  SELECT doc_id, n_chars,
      |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
      |    CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / NULLIF(length(text), 0) AS punct_ratio,
      |    CAST(len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is)\b')) AS DOUBLE)
      |      / NULLIF(len(regexp_extract_all(text, '\S+')), 0) AS stop_ratio
      |  FROM documents
      |)
      |ORDER BY doc_id""".stripMargin) { t =>
    val p = TextProfile(col("text"))
    t.documents
      .select(col("doc_id"), col("n_chars"),
        p.getField("n_ws_tokens").as("n_tokens"),
        (p.getField("n_punct").cast("double") /
          nullif(length(col("text")).cast("long"), lit(0L))).as("punct_ratio"),
        (p.getField("en_hits").cast("double") /
          nullif(p.getField("n_ws_tokens"), lit(0L))).as("stop_ratio"))
      .withColumn("quality",
        least(lit(1.0), col("n_chars").cast("double") / 500.0) * 0.5 +
          (lit(1.0) - col("punct_ratio")) * 0.3 +
          least(lit(1.0), col("stop_ratio") * 5.0) * 0.2)
      .drop("n_chars")
      .orderBy(col("doc_id"))
  }

  /** q32: stopword-profile language ID over {en,de,es,fr} with a fixed
    * tie-break order. The corpus is synthetic English-ish text, so the
    * interesting check is determinism (oracle) + behavior on real
    * multilingual samples (TextSpec crafts them in-memory).
    */
  val q32 = Q.of(
    "q32_lang_id",
    """SELECT doc_id, lang, en_hits, de_hits, es_hits, fr_hits,
      |  CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
      |       WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
      |       WHEN es_hits >= fr_hits THEN 'es'
      |       ELSE 'fr' END AS predicted
      |FROM (
      |  SELECT doc_id, lang,
      |    len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is)\b')) AS en_hits,
      |    len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|ein)\b')) AS de_hits,
      |    len(regexp_extract_all(text, '\b(el|los|las|una|es|y|que)\b')) AS es_hits,
      |    len(regexp_extract_all(text, '\b(le|les|des|et|est|une|dans)\b')) AS fr_hits
      |  FROM documents
      |)
      |ORDER BY doc_id""".stripMargin) { t =>
    val p = TextProfile(col("text"))
    val scored = t.documents.select(col("doc_id"), col("lang"),
      p.getField("en_hits").as("en_hits"),
      p.getField("de_hits").as("de_hits"),
      p.getField("es_hits").as("es_hits"),
      p.getField("fr_hits").as("fr_hits"))
    scored.withColumn("predicted",
      when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits") &&
        col("en_hits") >= col("fr_hits"), "en")
        .when(col("de_hits") >= col("es_hits") && col("de_hits") >= col("fr_hits"), "de")
        .when(col("es_hits") >= col("fr_hits"), "es")
        .otherwise("fr"))
      .orderBy(col("doc_id"))
  }

  /** q33: rolling-hash document fingerprint — min-MD5 over strided
    * 8-char shingles (a winnowing-style content fingerprint that
    * survives small edits far from the minimum), plus the exact md5 of
    * the full text for identity. Stride 8 keeps per-row cost at
    * n_chars/8 hash evaluations.
    */
  val q33 = Q.of(
    "q33_fingerprint",
    """SELECT doc_id,
      |  list_min(list_transform(generate_series(1, greatest(length(text)-7, 1), 8),
      |                          i -> md5(substr(text, i, 8)))) AS shingle_fp,
      |  md5(text) AS exact_fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { t =>
    t.documents
      .select(col("doc_id"),
        expr("array_min(transform(sequence(1, greatest(length(text)-7, 1), 8)," +
          " i -> md5(substr(text, i, 8))))").as("shingle_fp"),
        md5(col("text")).as("exact_fp"))
      .orderBy(col("doc_id"))
  }

  /** q34: char-3-gram shingle profile — total vs distinct shingles and
    * the repetition ratio (high repetition = low-quality boilerplate).
    */
  val q34 = Q.of(
    "q34_ngram_profile",
    """SELECT doc_id, n_shingles, n_distinct,
      |  CAST(n_distinct AS DOUBLE) / NULLIF(n_shingles, 0) AS distinct_ratio
      |FROM (
      |  SELECT doc_id,
      |    CAST(greatest(length(text)-2, 1) AS BIGINT) AS n_shingles,
      |    CAST(len(list_distinct(list_transform(generate_series(1, greatest(length(text)-2, 1), 1),
      |                                          i -> substr(text, i, 3)))) AS BIGINT) AS n_distinct
      |  FROM documents
      |)
      |ORDER BY doc_id""".stripMargin) { t =>
    t.documents
      .select(col("doc_id"),
        greatest(length(col("text")) - 2, lit(1)).cast("long").as("n_shingles"),
        expr("size(array_distinct(transform(sequence(1, greatest(length(text)-2, 1), 1)," +
          " i -> substr(text, i, 3))))").cast("long").as("n_distinct"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / nullif(col("n_shingles"), lit(0L)))
      .orderBy(col("doc_id"))
  }

  /** q37: per-source heavy-hitter tokens via the Misra–Gries typed
    * Aggregator ([[graft.functions.FrequentItems]], k=32 counters) +
    * exact verify: the MG pass ships ≤32 counters per source through
    * the shuffle regardless of vocabulary size; exact counting then
    * touches ONLY candidate tokens (broadcast candidate filter), and
    * the threshold keeps tokens with true count > N_source/33. The MG
    * guarantee (every item above N/(k+1) survives the summary, merges
    * included) makes the final set EXACTLY the brute-force answer, so
    * this sketch query has a real oracle — the oracle computes the
    * same set by counting every token, which is the plan shape this
    * query exists to avoid at scale.
    */
  val q37 = Q.of(
    "q37_frequent_tokens",
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents
      |), counts AS (
      |  SELECT source, token, COUNT(*) AS n_occurrences FROM tok GROUP BY 1, 2
      |), tot AS (SELECT source, COUNT(*) AS n_tok FROM tok GROUP BY 1)
      |SELECT c.source, c.token, c.n_occurrences
      |FROM counts c JOIN tot USING (source)
      |WHERE c.n_occurrences > n_tok / 33.0
      |ORDER BY c.source, c.token""".stripMargin) { t =>
    // deliberately NOT cached: both consumers re-derive the tokens,
    // but the codegen'd scan+explode is cheaper than materializing the
    // exploded rows (measured: caching costs ~20% here)
    val tokens = t.documents
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("token"))
    // the MG Aggregator runs as a UDAF in a plain relational groupBy:
    // the typed groupByKey path planned a non-codegen AppendColumns
    // (per-row lambda + serializer) over every token row just to name
    // the grouping key the frame already has as a column. The buffer
    // carries (total, counters), so ONE pass yields both the candidate
    // set and the per-source N — the r4 form re-derived the exploded
    // frame a third time just for the totals (VERDICT r4 #6).
    val mg = udaf(new graft.functions.FrequentItemsWithTotal(32),
      org.apache.spark.sql.Encoders.STRING)
    val cands = tokens.groupBy(col("source")).agg(mg(col("token")).as("graft_s"))
      .select(col("source"), col("graft_s._1").as("n_tok"),
        explode(map_keys(col("graft_s._2"))).as("token"))
    tokens
      .join(broadcast(cands), Seq("source", "token"))
      .groupBy(col("source"), col("token"), col("n_tok"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") > col("n_tok") / lit(33.0))
      .select(col("source"), col("token"), col("n_occurrences"))
      .orderBy(col("source"), col("token"))
  }

  /** q38: the composed corpus-curation pass — the "a user could run
    * their whole pipeline" query: language gate (q32's profile) →
    * quality gate (q31's score ≥ 0.5) → exact dedup survivors (q40's
    * operator, lowest doc_id per content hash) → per-source doc count,
    * token budget and mean quality. All seven per-row counts come from
    * ONE [[graft.functions.TextProfile]] pass, so even where Catalyst
    * pushes the gate predicates below the projection the duplicated
    * references are single fused walks (collapsed further by codegen
    * subexpression elimination) — the r3 regex form paid ~20
    * match-array regex scans per row here. The only shuffles are the
    * dedup hash and the final per-source aggregate. Deterministic end
    * to end, so the whole composition has an exact oracle.
    */
  val q38 = Q.of(
    "q38_corpus_pipeline",
    """WITH scored AS (
      |  SELECT doc_id, source, text, n_chars,
      |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
      |    CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / NULLIF(length(text), 0) AS punct_ratio,
      |    CAST(len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is)\b')) AS DOUBLE)
      |      / NULLIF(len(regexp_extract_all(text, '\S+')), 0) AS stop_ratio,
      |    len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is)\b')) AS en_hits,
      |    len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|ein)\b')) AS de_hits,
      |    len(regexp_extract_all(text, '\b(el|los|las|una|es|y|que)\b')) AS es_hits,
      |    len(regexp_extract_all(text, '\b(le|les|des|et|est|une|dans)\b')) AS fr_hits
      |  FROM documents
      |), kept AS (
      |  SELECT *, round(least(1.0, n_chars/500.0)*0.5 + (1.0-punct_ratio)*0.3
      |                  + least(1.0, stop_ratio*5.0)*0.2, 4) AS quality
      |  FROM scored
      |  WHERE en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits
      |), filtered AS (
      |  SELECT * FROM kept WHERE quality >= 0.5
      |), surv AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM filtered
      |  ) WHERE rn = 1
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  round(CAST(SUM(CAST(quality AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*), 4) AS mean_quality
      |FROM surv GROUP BY source
      |ORDER BY source""".stripMargin) { t => corpusPipeline(t, nearDupJaccard = None) }

  /** The corpus-curation survivors BEFORE the per-source aggregate:
    * language gate → quality gate → exact dedup (q38's stages), plus —
    * when `nearDupJaccard` is set — the near-dup resolution stage
    * (q45's operator: jaccard-pair LSH → connected components →
    * lowest-id survivor). The registered q38 runs with the stage off
    * so its oracle stays purely relational; TextSpec proves the staged
    * form drops exactly the non-survivor near-dup members on top.
    *
    * The quality GATE here deliberately keeps the round-to-4 form
    * (mirrored in the oracle): the rounded threshold set is
    * well-defined, the value never reaches the output raw (only the
    * decimal-summed mean does), and exposure to the §6(i) tie class
    * is boundary-only — unlike q31, whose per-doc output emits the
    * unrounded identical-expression double.
    */
  private[graft] def curatedSurvivors(t: Tables, nearDupJaccard: Option[Double]): org.apache.spark.sql.DataFrame = {
    import graft.operators.{Dedup => D}
    val p = TextProfile(col("text"))
    val scored = t.documents.select(
      col("doc_id"), col("source"), col("text"), col("n_chars"),
      p.getField("n_ws_tokens").as("n_tokens"),
      (p.getField("n_punct").cast("double") /
        nullif(length(col("text")).cast("long"), lit(0L))).as("punct_ratio"),
      (p.getField("en_hits").cast("double") /
        nullif(p.getField("n_ws_tokens"), lit(0L))).as("stop_ratio"),
      p.getField("en_hits").as("en_hits"),
      p.getField("de_hits").as("de_hits"),
      p.getField("es_hits").as("es_hits"),
      p.getField("fr_hits").as("fr_hits"))
    val kept = scored
      .filter(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits") &&
        col("en_hits") >= col("fr_hits"))
      .withColumn("quality", round(
        least(lit(1.0), col("n_chars") / 500.0) * 0.5 +
          (lit(1.0) - col("punct_ratio")) * 0.3 +
          least(lit(1.0), col("stop_ratio") * 5.0) * 0.2, 4))
      .filter(col("quality") >= 0.5)
    val exact = D.exactByContent(kept, "text", "doc_id")
    nearDupJaccard.fold(exact)(j => D.dropNearDups(exact, "doc_id", "text", n = 5, minJaccard = j))
  }

  /** q38's full plan with the optional near-dup stage exposed. */
  def corpusPipeline(t: Tables, nearDupJaccard: Option[Double]): org.apache.spark.sql.DataFrame = {
    import graft.functions.det._
    curatedSurvivors(t, nearDupJaccard)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(dsum(col("quality")) / count(lit(1)), 4).as("mean_quality"))
      .orderBy(col("source"))
  }

  /** q78: deterministic stratified sample
    * ([[graft.operators.Sampling.stratifiedDeterministic]]) — the
    * reproducible "k docs per source" training-mix draw: rows ranked
    * inside each stratum by md5(text) (doc_id tie-break for duplicate
    * content) and the top 10 kept. Content-hash ordering makes the
    * sample independent of input order and identical across runs,
    * retries, and engines — which is exactly why it has an exact
    * oracle while `rand()`-sampling never could. One source exchange +
    * streaming per-group rank; no global sort. The output is a sample
    * MANIFEST (stratum, id, size), and the hash is computed scan-side
    * BEFORE the rank exchange with the text projected away — at
    * 100 TB the rank shuffle ships (source, id, size, 32-byte hash),
    * never the corpus; the sampled text is fetched by a downstream
    * join on the ids (slim exchange + pruned scan pinned by
    * RelationalSpec/PlanHygieneSpec).
    */
  val q78 = Q.of(
    "q78_stratified_sample",
    """SELECT source, doc_id, n_chars FROM (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rk
      |  FROM documents
      |) WHERE rk <= 10
      |ORDER BY source, doc_id""".stripMargin) { t =>
    graft.operators.Sampling.stratifiedByKey(
        t.documents.select(col("source"), col("doc_id"), col("n_chars"),
          md5(col("text")).as("graft_h")),
        col("source"), col("graft_h"), col("doc_id"), k = 10)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** q79: deterministic train/val/test split
    * ([[graft.operators.Sampling.hashSplit]] 80/10/10) rolled up per
    * (split, lang) — the assignment is pure column arithmetic on
    * md5-prefix thresholds (no shuffle for the split itself; the only
    * exchange is this health-check rollup), identical across runs,
    * engines, and cluster sizes. Thresholds: round(.8·65536) = 0xcccd,
    * round(.9·65536) = 0xe666 — lowercase-hex string comparison
    * matches DuckDB exactly, so even the per-bucket membership is
    * oracle-checked (through these counts; DedupSpec-style exactness
    * rides on md5 agreement already proven by q40).
    */
  val q79 = Q.of(
    "q79_train_test_split",
    """SELECT split, lang, COUNT(*) AS n FROM (
      |  SELECT lang,
      |    CASE WHEN md5(text) < 'cccd' THEN 'train'
      |         WHEN md5(text) < 'e666' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents
      |)
      |GROUP BY 1, 2
      |ORDER BY split, lang""".stripMargin) { t =>
    graft.operators.Sampling.hashSplit(
        t.documents.select(col("text"), col("lang")),
        col("text"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"), col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("split"), col("lang"))
  }

  /** q80: deterministic shard packing
    * ([[graft.operators.PrefixSum.orderedRunningSum]]) — docs packed
    * into fixed-budget shards (20k chars here) in content-hash order:
    * shard = exclusive running cost ÷ budget, so a doc lands in the
    * shard where its first byte falls and shard boundaries are
    * identical on every run/engine. The running sum is the DISTRIBUTED
    * two-phase prefix scan (range partition → per-partition offsets
    * through bounded driver state → parallel local sums), never the
    * single-task global window; the rollup is per-shard doc counts
    * and total cost, oracle-checked against DuckDB's window cumsum.
    */
  val q80 = Q.of(
    "q80_token_shards",
    """WITH ordered AS (
      |  SELECT doc_id, n_chars,
      |    SUM(n_chars) OVER (ORDER BY md5(text), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars AS excl
      |  FROM documents
      |)
      |SELECT CAST(excl // 20000 AS BIGINT) AS shard_id, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM ordered GROUP BY 1 ORDER BY shard_id""".stripMargin) { t =>
    import graft.operators.PrefixSum
    val run = PrefixSum.orderedRunningSum(
      t.documents.select(col("doc_id"), col("n_chars"), md5(col("text")).as("graft_h")),
      orderBy = Seq(col("graft_h"), col("doc_id")),
      value = col("n_chars"), outCol = "graft_run", numPartitions = 8)
    run
      .withColumn("shard_id", expr("(graft_run - n_chars) div 20000"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("shard_id"))
  }

  /** q113: MIXTURE sampling ([[graft.operators.Sampling
    * .mixtureSample]]) — the domain-reweighting step of a training
    * pipeline (the DoReMi/data-mixing loop, executed as a filter):
    * each source stratum keeps its own target fraction via the q79
    * md5-threshold mechanism (`md5(text) < hex(round(rate·65536))`),
    * so membership is content-keyed, cross-engine exact, reproducible
    * across runs/cluster sizes, and NESTED across rates (a 25% sample
    * is a subset of the 50% sample on the same key — the property
    * rate-ramp experiments rely on). src0 keeps everything, src1 75%,
    * src2 50%, src3 25%, everything else 12.5%. Pure projection +
    * filter — ZERO shuffle at any corpus size (the ORDER BY is
    * presentation); the oracle pins doc-level MEMBERSHIP, not just
    * counts.
    */
  val q113 = Q.of(
    "q113_mixture_sample",
    """SELECT source, doc_id FROM documents
      |WHERE CASE source
      |  WHEN 'src0' THEN TRUE
      |  WHEN 'src1' THEN md5(text) < 'c000'
      |  WHEN 'src2' THEN md5(text) < '8000'
      |  WHEN 'src3' THEN md5(text) < '4000'
      |  ELSE md5(text) < '2000' END
      |ORDER BY source, doc_id""".stripMargin) { t =>
    graft.operators.Sampling.mixtureSample(
        t.documents.select(col("source"), col("doc_id"), col("text")),
        col("source"), col("text"),
        rates = Seq("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25),
        defaultRate = 0.125)
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  def all: Seq[Q] = Seq(q30, q31, q32, q33, q34, q37, q38, q78, q79, q80, q113)
}
