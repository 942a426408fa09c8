package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** q196: JOIN-KEY SKEW / cardinality audit — the optimizer-statistics
  * operator behind every shuffle decision this library makes: before
  * a 100 TB join you ask (a) how many distinct keys will the exchange
  * spread over, (b) how hot is the hottest key (the q26 salting and
  * AQE-skew-split trigger), and (c) how big is the join output
  * (|A ⋈_k A| = Σ c(k)² — the classic frequency-histogram join-size
  * estimate, Selinger-era public canon, EXACT here because the full
  * per-key histogram folds it, not a sample). q26 APPLIES salting;
  * this measures when it's needed and emits the suggested factor.
  *
  * Audited per key column of the fact (partkey / suppkey / orderkey —
  * three aggregates over one cached scan projection, unioned): row
  * and key counts, max per-key count, mean×100 and max/mean×100 as
  * exact integers (floor of integer products — no doubles anywhere),
  * exact self-join output size Σc², and salt_suggest =
  * ⌈max_cnt·n_keys/n_rows⌉ clamped to ≥1 — the q26 knob value that
  * would level the hottest key to roughly the mean.
  *
  * Scale shape: per-key-column map-side-combined count aggregate
  * (distinct keys cross the exchange, not rows) folding to ONE row
  * each; the union is 3 rows. Σc² for a 10⁹-hot key would overflow
  * int64 at ~3·10⁹ — the DECIMAL(38,0) lane documented in q172
  * applies; at any SF here max_cnt is far below that.
  */
object SkewAudit {

  /** One-row skew/cardinality audit of `key` in `df`. Factored so the
    * spec can pin uniform (skew 100, salt 1) vs single-hot-key
    * fixtures and the Σc² identity against a computed cross join.
    */
  def keyAudit(df: DataFrame, key: Column, label: String): DataFrame =
    df.select(key.as("graft_k"))
      .groupBy(col("graft_k"))
      .agg(count(lit(1)).as("graft_c"))
      .agg(
        sum(col("graft_c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("graft_c")).as("max_cnt"),
        sum(col("graft_c") * col("graft_c")).as("selfjoin_rows"))
      .select(
        lit(label).as("key_name"),
        col("n_rows"), col("n_keys"), col("max_cnt"), col("selfjoin_rows"),
        // floor/ceil over EXPLICIT double divisions, token-identical in
        // the oracle: Spark casts double→long by truncation but DuckDB
        // by rounding, so the integerization must happen via floor/ceil
        // on both sides, never via a bare cast.
        floor(lit(100.0) * col("n_rows").cast("double") /
          col("n_keys").cast("double")).as("mean_x100"),
        floor(lit(100.0) * (col("max_cnt") * col("n_keys")).cast("double") /
          col("n_rows").cast("double")).as("skew_x100"),
        greatest(lit(1L),
          ceil((col("max_cnt") * col("n_keys")).cast("double") /
            col("n_rows").cast("double"))).as("salt_suggest"))

  val q196 = Q.of(
    "q196_skew_audit",
    """WITH fact AS (
      |  SELECT l_partkey, l_suppkey, l_orderkey FROM lineitem
      |), audit AS (
      |  SELECT 'l_partkey' AS key_name, k FROM (SELECT l_partkey AS k FROM fact)
      |  UNION ALL
      |  SELECT 'l_suppkey', k FROM (SELECT l_suppkey AS k FROM fact)
      |  UNION ALL
      |  SELECT 'l_orderkey', k FROM (SELECT l_orderkey AS k FROM fact)
      |), cells AS (
      |  SELECT key_name, k, COUNT(*) AS c FROM audit GROUP BY 1, 2
      |), folded AS (
      |  SELECT key_name,
      |    CAST(SUM(c) AS BIGINT) AS n_rows,
      |    CAST(COUNT(*) AS BIGINT) AS n_keys,
      |    CAST(MAX(c) AS BIGINT) AS max_cnt,
      |    CAST(SUM(c * c) AS BIGINT) AS selfjoin_rows
      |  FROM cells GROUP BY 1
      |)
      |SELECT key_name, n_rows, n_keys, max_cnt, selfjoin_rows,
      |  CAST(FLOOR(100.0 * CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE))
      |    AS BIGINT) AS mean_x100,
      |  CAST(FLOOR(100.0 * CAST(max_cnt * n_keys AS DOUBLE)
      |    / CAST(n_rows AS DOUBLE)) AS BIGINT) AS skew_x100,
      |  GREATEST(1, CAST(CEIL(CAST(max_cnt * n_keys AS DOUBLE)
      |    / CAST(n_rows AS DOUBLE)) AS BIGINT)) AS salt_suggest
      |FROM folded
      |ORDER BY key_name""".stripMargin) { t =>
    val fact = t.lineitem.select(col("l_partkey"), col("l_suppkey"),
      col("l_orderkey"))
    keyAudit(fact, col("l_partkey"), "l_partkey")
      .unionAll(keyAudit(fact, col("l_suppkey"), "l_suppkey"))
      .unionAll(keyAudit(fact, col("l_orderkey"), "l_orderkey"))
      .orderBy(col("key_name"))
  }

  def all: Seq[Q] = Seq(q196)
}
