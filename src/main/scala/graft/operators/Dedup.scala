package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over a text corpus (SURVEY.md §2 q40–q43,
  * §5 scale rules). The reference has no dedup surface; these are the
  * training-data-pipeline extensions required by the brief, built as
  * shuffle-on-key bucket plans — never all-pairs.
  *
  * Scale shape shared by MinHash and SimHash:
  *   1. per-row signature computation — pure column expressions
  *      (nested transform/aggregate over the shingle/token arrays), no
  *      shuffle, stays in WholeStageCodegen;
  *   2. explode to (band, bandHash) keys — output rows = docs × bands;
  *   3. self-join on the band key — the only shuffle; bucket sizes are
  *      bounded because a band hash is 64-bit (hot buckets only from
  *      true near-dups);
  *   4. `doc_a < doc_b` pruning + distinct to emit each candidate pair
  *      once.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per content hash. One shuffle
    * on the 128-bit content hash; survivors carry all source columns.
    */
  def exactByContent(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("graft_content_hash")).orderBy(col(idCol))
    df.withColumn("graft_content_hash", md5(col(textCol)))
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .drop("graft_rn")
  }

  /** Adds `shingles`: the distinct character n-gram set of `textCol`.
    * O(n_chars) per row, no shuffle.
    */
  def withShingles(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.withColumn("shingles", expr(
      s"array_distinct(transform(sequence(1, greatest(length($textCol)-${n - 1}, 1), 1)," +
        s" i -> substr($textCol, i, $n)))"))

  /** Adds `minhash`: an array of `numHashes` min-values of seeded
    * xxhash64 over the shingle set — the classic MinHash signature,
    * computed entirely per-row (seed h is mixed in as an extra hash
    * argument; no hash-function table needed).
    */
  def withMinHash(df: DataFrame, numHashes: Int): DataFrame =
    df.withColumn("minhash", expr(
      s"transform(sequence(0, ${numHashes - 1})," +
        s" h -> array_min(transform(shingles, s -> xxhash64(h, s))))"))

  /** LSH band-bucket candidate pairs from MinHash signatures.
    * `bands × rowsPerBand` must equal the signature length. A pair
    * collides if any band of `rowsPerBand` consecutive minhash values
    * matches exactly; P(collide | jaccard=j) = 1-(1-j^r)^b, so
    * b=16/r=2 keeps recall ≈ 1 down to j≈0.8 (q43's verify threshold).
    * Returns (doc_a, doc_b, est_jaccard) with est_jaccard = fraction of
    * agreeing signature positions.
    */
  def minHashCandidates(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = sigs.select(col(idCol), col("minhash"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1})," +
          s" b -> xxhash64(b, slice(minhash, b * $rowsPerBand + 1, $rowsPerBand)))"))
        .as(Seq("band", "band_hash")))
    val a = banded.select(col(idCol).as("doc_a"), col("minhash").as("mh_a"),
      col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("doc_b"), col("minhash").as("mh_b"),
      col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("mh_a"), col("mh_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") /
          size(col("mh_a"))).as("est_jaccard"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
  }

  /** Adds `simhash`: 64-bit SimHash over whitespace tokens — bit b is
    * set when the signed sum of token-hash bit b is non-negative.
    * Near-identical documents land within a few bits of Hamming
    * distance. Pure per-row expression (two nested folds).
    */
  def withSimHash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("graft_token_hashes",
        expr(s"transform(regexp_extract_all($textCol, '\\\\S+', 0), t -> xxhash64(t))"))
      .withColumn("simhash", expr(
        "aggregate(sequence(0, 63), 0L, (acc, b) -> acc | " +
          "shiftleft(IF(aggregate(graft_token_hashes, 0, " +
          "(a, h) -> a + IF((shiftright(h, b) & 1) = 1, 1, -1)) >= 0, 1L, 0L), b))"))
      .drop("graft_token_hashes")

  /** SimHash candidate pairs: bucket on 4 bands of 16 bits (guaranteed
    * recall for Hamming distance ≤ 3 by pigeonhole; high recall to ~6),
    * then verify `bit_count(xor) <= maxHamming` inside buckets.
    */
  def simHashCandidates(df: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val banded = df.select(col(idCol), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(simhash, b * 16) & 65535L)"))
        .as(Seq("band", "band_val")))
    val a = banded.select(col(idCol).as("doc_a"), col("simhash").as("sh_a"),
      col("band"), col("band_val"))
    val b = banded.select(col(idCol).as("doc_b"), col("simhash").as("sh_b"),
      col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(first(col("hamming")).as("hamming"))
  }

  /** Exact n-gram Jaccard for a candidate-pair frame — the verify pass
    * after LSH candidate generation. Joins the shingle sets back onto
    * the pairs (two hash joins on doc id, the natural key).
    */
  def jaccardVerify(pairs: DataFrame, shingled: DataFrame, idCol: String): DataFrame = {
    val sa = shingled.select(col(idCol).as("doc_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col(idCol).as("doc_b"), col("shingles").as("sh_b"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .drop("sh_a", "sh_b")
  }
}
