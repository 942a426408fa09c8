package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** q85: benchmark-contamination check — the decontamination pass every
  * pretraining pipeline runs before training: which corpus documents
  * share a long n-gram with the evaluation/benchmark suite?
  *
  * The benchmark suite here is the deterministic `doc_id % 7 = 0`
  * slice of `documents` (standing in for a held-out eval set); the
  * corpus is the rest. A document is contaminated when it shares at
  * least one word 8-gram with any benchmark doc — at k=8 over this
  * vocabulary, random collisions are ~nil, so hits are real near-dup
  * overlap (measured: 9 contaminated docs / 606 shingle-pair hits at
  * sf0.01), exactly the leakage class decontamination exists to catch.
  *
  * Scale shape (100 TB): shingles are deduped PER DOC at the array
  * level (`array_distinct` before `explode`) so no per-doc distinct
  * aggregation is needed downstream, and each shingle crosses the
  * join exchange as an 8-byte `xxhash64`, not the ~40-byte string
  * (5× slimmer shuffle; P(64-bit collision) at 25 M corpus shingles ×
  * 26 k bench shingles ≈ 3.5e-8 — the oracle joins on the raw string,
  * so a collision would surface as a hash mismatch, none observed
  * through sf1). The benchmark side of a real deployment is a fixed
  * eval suite (≪ corpus) — the join is a plain equi-join and AQE
  * broadcasts it when genuinely small (dimBroadcast doctrine: never
  * forced). The only wide exchanges are the hash join and the final
  * per-doc count-distinct pair.
  */
object Contamination {

  private val K = 8

  val q85 = Q.of(
    "q85_contamination",
    s"""WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(w) - ${K - 2}),
      |      i -> array_to_string(w[i:i+${K - 1}], ' '))) AS shl
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |  WHERE len(w) >= $K
      |), e AS (SELECT doc_id, unnest(shl) AS sh FROM sh),
      |bench AS (SELECT doc_id AS bench_id, sh FROM e WHERE doc_id % 7 = 0),
      |corp AS (SELECT doc_id, sh FROM e WHERE doc_id % 7 != 0)
      |SELECT doc_id,
      |  count(DISTINCT sh) AS n_hit_shingles,
      |  count(DISTINCT bench_id) AS n_bench_docs
      |FROM corp JOIN bench USING (sh)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { t =>
    overlapReport(t.documents, mod = 7, k = K).orderBy(col("doc_id"))
  }

  /** The q85 body over any (doc_id, text) frame — benchmark slice =
    * `doc_id % mod = 0`; factored so CurationSpec can plant a known
    * shared k-gram and assert it is the ONLY hit.
    */
  def overlapReport(docs: org.apache.spark.sql.DataFrame, mod: Int, k: Int): org.apache.spark.sql.DataFrame = {
    val shingled = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(0, size(w) - $k)," +
          s" i -> xxhash64(concat_ws(' ', slice(w, i + 1, $k)))))")).as("h"))
    val bench = shingled.filter(col("doc_id") % mod === 0)
      .select(col("doc_id").as("bench_id"), col("h"))
    val corp = shingled.filter(col("doc_id") % mod =!= 0)
    corp.join(bench, "h")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("h")).as("n_hit_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }

  def all: Seq[Q] = Seq(q85)
}
