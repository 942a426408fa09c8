package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q238: ORACLE-CHECKED MinHash-LSH calibration — the full
  * minhash → band → candidate-pair pipeline built from md5-derived
  * Carter–Wegman permutations, with every candidate pair's ESTIMATED
  * Jaccard (agreeing signature slots / 32) laid against its EXACT
  * Jaccard, bucketed by slot agreement. The production dedup path
  * (q41) hashes with xxhash64, which DuckDB cannot replay, so its
  * accuracy is recall-bounded in spec; THIS query re-expresses the
  * identical mechanics over md5 (one md5 per shingle → two 32-bit
  * halves → h_j = (a + j·(2b+1)) mod p, the standard universal-hash
  * family, public) — making the LSH machinery itself hash-exact
  * against the oracle, and emitting the estimator's calibration
  * curve (E[est | exact] ≈ exact is the MinHash guarantee; the
  * per-bucket mean-exact column shows it).
  *
  * Determinism: signatures, band keys, candidate pairs, and slot
  * agreements are pure integer/string computation — identical by
  * construction; exact Jaccard is an integer ratio; per-bucket mean
  * exact rides D18_6 quantization + exact decimal sums (the q129
  * rule); est = agree/32 is one IEEE division.
  *
  * Scale shape (the q41 discipline, SQL-replayable): signatures fold
  * IN-ROW over the per-doc distinct shingle array (no shingle
  * explode, no 32× blowup — one md5 per shingle, 32 linear combos);
  * only (band-key, doc_id) pairs ride the candidate exchange; the
  * exact-Jaccard join ships shingle sets for CANDIDATE docs only
  * (pair volume ∝ near-dup density, the banding bound). Output
  * ≤ 33 calibration rows.
  *
  * Cost honesty: q41 runs the same banding over xxhash64 in ~0.9 s at
  * sf0.1; this query pays ~2.2 s warm — md5 hex plus the exact-Jaccard
  * leg — the deliberate price of DuckDB replayability (an earlier
  * in-row HOF signature form cost ~9 s; see the codegen note at the
  * signature aggregate). q41 stays the production dedup path; this is
  * its oracle-checked calibration twin, run at audit cadence, not
  * per-batch.
  */
object MinhashCal {

  /** Shingle width (words), permutation count, band geometry. */
  private val K = 3
  private val Perms = 32
  private val Bands = 8
  private val RowsPerBand = Perms / Bands
  private val P = 4294967311L // first prime above 2^32

  val q238 = Q.of(
    "q238_minhash_calibration",
    s"""WITH base AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(w) - ${K - 2}),
      |      i -> md5(array_to_string(w[i:i + ${K - 1}], ' ')))) AS shl
      |  FROM base WHERE len(w) >= $K
      |), ab AS (
      |  SELECT doc_id, shl,
      |    list_transform(shl, s -> [
      |      CAST(('0x' || substr(s, 1, 8)) AS BIGINT),
      |      CAST(('0x' || substr(s, 9, 8)) AS BIGINT) * 2 + 1]) AS hp
      |  FROM sh
      |), sig AS (
      |  SELECT doc_id, shl,
      |    list_transform(range(0, $Perms),
      |      j -> list_min(list_transform(hp, p -> (p[1] + j * p[2]) % $P))) AS sg
      |  FROM ab
      |), bk AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(0, $Bands), b -> b || ':' ||
      |      array_to_string(sg[b * $RowsPerBand + 1 : b * $RowsPerBand + $RowsPerBand], '-'))) AS k
      |  FROM sig
      |), pairs AS (
      |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
      |  FROM bk x JOIN bk y ON x.k = y.k AND x.doc_id < y.doc_id
      |), scored AS (
      |  SELECT da, db,
      |    CAST(list_sum(list_transform(range(1, $Perms + 1),
      |      i -> CASE WHEN sa.sg[i] = sb.sg[i] THEN 1 ELSE 0 END)) AS BIGINT) AS agree,
      |    CAST(len(list_intersect(sa.shl, sb.shl)) AS BIGINT) AS inter,
      |    CAST(len(sa.shl) + len(sb.shl) AS BIGINT) AS szsum
      |  FROM pairs JOIN sig sa ON sa.doc_id = pairs.da
      |  JOIN sig sb ON sb.doc_id = pairs.db
      |), jx AS (
      |  SELECT agree,
      |    CAST(CAST(inter AS DOUBLE) / CAST(szsum - inter AS DOUBLE)
      |      AS DECIMAL(18,6)) AS exact_q
      |  FROM scored
      |)
      |SELECT agree, CAST(agree AS DOUBLE) / 32.0 AS est_jaccard,
      |  COUNT(*) AS n_pairs,
      |  CAST(SUM(exact_q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_exact,
      |  CAST(MIN(exact_q) AS DOUBLE) AS min_exact,
      |  CAST(MAX(exact_q) AS DOUBLE) AS max_exact
      |FROM jx GROUP BY agree
      |ORDER BY agree""".stripMargin) { t =>
    calibrate(t.documents)
  }

  /** The calibration plan over a (doc_id, text) frame. Factored so
    * the spec can pin identical docs (agree 32, exact 1), disjoint
    * docs never pairing, and the estimator arithmetic.
    */
  def calibrate(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= K)
      .select(col("doc_id"), expr(
        s"array_distinct(transform(sequence(0, size(w) - $K)," +
          s" i -> md5(concat_ws(' ', slice(w, i + 1, $K)))))").as("shl"))
    // Signature computation stays OUT of higher-order functions:
    // Spark HOF lambdas run interpreted (no whole-stage codegen), and
    // 32 perms x ~50 shingles x corpus made the in-row transform()
    // form the bench's second-costliest stage (~9 s at sf0.1). The
    // codegen'd shape: explode ONE (a, b) pair per shingle, then a
    // doc-keyed HashAggregate with 32 min() columns — every min is a
    // plain codegen'd expression, map-side combined, and the exchange
    // carries (doc_id, 2 longs) per shingle exactly once (measured:
    // ~3x faster; semantics identical to the oracle's per-j list_min).
    val shc = graft.CacheScope.trackedCache(sh)
    val ab = shc.select(col("doc_id"), explode(col("shl")).as("s"))
      .select(col("doc_id"),
        expr("cast(conv(substring(s, 1, 8), 16, 10) as bigint)").as("a"),
        expr("cast(conv(substring(s, 9, 8), 16, 10) as bigint) * 2 + 1")
          .as("b"))
    val minCols = (0 until Perms).map(j =>
      min((col("a") + lit(j.toLong) * col("b")) % lit(P)).as(s"s$j"))
    val sigAgg = ab.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until Perms).map(j => col(s"s$j")): _*).as("sg"))
    val sigc = graft.CacheScope.trackedCache(
      sigAgg.join(shc, Seq("doc_id")).select(col("doc_id"), col("sg"), col("shl")))
    val bk = sigc.select(col("doc_id"), explode(expr(
      s"transform(sequence(0, ${Bands - 1}), b -> concat(b, ':'," +
        s" concat_ws('-', transform(slice(sg, b * $RowsPerBand + 1, $RowsPerBand)," +
        s" x -> cast(x as string)))))")).as("k"))
    val pairs = bk.as("x")
      .join(bk.as("y"),
        col("x.k") === col("y.k") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    val scored = pairs
      .join(sigc.select(col("doc_id").as("da"), col("sg").as("sa"),
        col("shl").as("la")), Seq("da"))
      .join(sigc.select(col("doc_id").as("db"), col("sg").as("sb"),
        col("shl").as("lb")), Seq("db"))
      .select(
        expr(s"cast(aggregate(transform(sequence(1, $Perms)," +
          " i -> if(element_at(sa, i) = element_at(sb, i), 1, 0))," +
          " 0L, (acc, x) -> acc + x) as bigint)").as("agree"),
        size(array_intersect(col("la"), col("lb"))).cast("long").as("inter"),
        (size(col("la")) + size(col("lb"))).cast("long").as("szsum"))
    val jx = scored.select(col("agree"),
      (col("inter").cast("double") / (col("szsum") - col("inter")).cast("double"))
        .cast(det.D18_6).as("exact_q"))
    jx.groupBy(col("agree"))
      .agg(
        count(lit(1)).as("n_pairs"),
        (sum(col("exact_q")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_exact"),
        min(col("exact_q")).cast("double").as("min_exact"),
        max(col("exact_q")).cast("double").as("max_exact"))
      .select(col("agree"),
        (col("agree").cast("double") / lit(32.0)).as("est_jaccard"),
        col("n_pairs"), col("mean_exact"), col("min_exact"), col("max_exact"))
      .orderBy(col("agree"))
  }

  def all: Seq[Q] = Seq(q238)
}
