package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q265: CANONICALIZATION DEDUP — the tier between q40 (byte-exact
  * dedup) and q41/q43 (near-dup): lowercase, strip non-alphanumerics,
  * collapse whitespace, then dedup on md5 of the CANONICAL form. This
  * is the "fuzzy-exact" grain every production corpus pipeline runs
  * first (C4/CCNet-style normalization before shingling — public
  * recipe): it collapses casing/punctuation/respacing variants that
  * byte-exact misses at near-zero cost, BEFORE the expensive LSH
  * tiers see them.
  *
  * Per source: doc count, distinct raw keys (the q40 grain), distinct
  * canonical keys, `canon_gain` = raw − canonical (variants ONLY
  * normalization catches), and `cross_src_keys` = canonical keys this
  * source shares with ≥ 1 other source (the q223 cross-source grain
  * at the canonical level — syndication that survives reformatting).
  *
  * Determinism: lower/regexp_replace on the ASCII token alphabet and
  * md5 keys are byte-identical cross-engine (Java regex and RE2 agree
  * on `[^a-z0-9 ]` and ` +`); all outputs are integer counts.
  *
  * Scale shape: one projection pass (codegen'd regex) + two
  * key-grouped exchanges (per-source distinct counts; canonical-key
  * source spread). No joins on the fact beyond key groupBys; output
  * is |sources| rows. The canonical md5 key, not the text, rides
  * every exchange.
  */
object NormalizedDedup {

  private[queries] val CanonSql =
    "md5(trim(regexp_replace(regexp_replace(lower(text)," +
      " '[^a-z0-9 ]', ''), ' +', ' ')))"

  private[queries] val CanonDuck =
    "md5(trim(regexp_replace(regexp_replace(lower(text)," +
      " '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))"

  val q265 = Q.of(
    "q265_normalized_dedup",
    s"""WITH c AS (
      |  SELECT source, md5(text) AS rk, $CanonDuck AS ck FROM documents
      |), per AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(COUNT(DISTINCT rk) AS BIGINT) AS n_raw_keys,
      |    CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_canon_keys
      |  FROM c GROUP BY source
      |), sk AS (
      |  SELECT DISTINCT source, ck FROM c
      |), ks AS (
      |  SELECT ck, COUNT(*) AS ns FROM sk GROUP BY ck
      |), xs AS (
      |  SELECT sk.source, CAST(COUNT(*) AS BIGINT) AS cross_keys
      |  FROM sk JOIN ks ON ks.ck = sk.ck AND ks.ns >= 2
      |  GROUP BY sk.source
      |)
      |SELECT per.source, n_docs, n_raw_keys, n_canon_keys,
      |  n_raw_keys - n_canon_keys AS canon_gain,
      |  COALESCE(cross_keys, 0) AS cross_src_keys
      |FROM per LEFT JOIN xs ON xs.source = per.source
      |ORDER BY per.source""".stripMargin) { t =>
    report(t.documents)
  }

  /** The per-source canonicalization report. Factored so the spec can
    * plant casing/punctuation variants and cross-source syndication.
    */
  def report(docs: DataFrame): DataFrame = {
    val c = docs.select(col("source"),
      md5(col("text")).as("rk"), expr(CanonSql).as("ck"))
    val per = c.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("rk")).as("n_raw_keys"),
      countDistinct(col("ck")).as("n_canon_keys"))
    val sk = c.select(col("source"), col("ck")).distinct()
    val ks = sk.groupBy(col("ck")).agg(count(lit(1)).as("graft_ns"))
      .filter(col("graft_ns") >= 2)
      .select(col("ck"))
    val xs = sk.join(ks, Seq("ck"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("cross_keys"))
    per.join(xs, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"), col("n_raw_keys"), col("n_canon_keys"),
        (col("n_raw_keys") - col("n_canon_keys")).as("canon_gain"),
        coalesce(col("cross_keys"), lit(0L)).as("cross_src_keys"))
      .orderBy(col("source"))
  }

  def all: Seq[Q] = Seq(q265)
}
