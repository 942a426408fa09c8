package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** q194: SNAPSHOT DIFF / data-reconciliation audit — the table-level
  * twin of q123 (schema drift) and q180 (referential integrity): two
  * warehouse snapshots of the same keyed table, one keyed full-outer
  * comparison, and a bounded per-disposition ledger of adds, drops,
  * and per-column changes. This is the Datafold/"data-diff" audit
  * every CDC/backfill deploy runs before switching readers over
  * (reconciliation over row-level diffing is public warehouse canon),
  * and the missing READ side of q94's CDC apply: q94 maintains the
  * table, q194 proves two maintained copies agree — and says exactly
  * where they don't.
  *
  * Snapshot construction (deterministic, key-arithmetic): snapshot A
  * drops keys ≡0 (mod 10); snapshot B drops keys ≡1 (mod 10), bumps
  * price by 10% on keys ≡0 (mod 7), and rewrites status to 'X' on
  * keys ≡0 (mod 13) — so added / removed / price-changed /
  * status-changed / both-changed / unchanged dispositions all occur.
  *
  * Determinism: change flags compare EXACT operands (the 1.1 price
  * bump is the same IEEE token on both engines, so the double
  * comparison is bit-deterministic); the ledger is pure integer
  * counting plus min/max key bounds per cell.
  *
  * Scale shape: one co-partitioned full-outer join on the key (both
  * sides shuffle once on o_orderkey — at 100 TB this is the sort-
  * merge shape AQE picks), folding into a ≤8-row disposition ledger
  * via map-side combine. Nothing row-level leaves the join stage:
  * the audit output is bounded regardless of table size; min/max
  * sample keys give the operator a place to START drilling without
  * shipping the row-level diff anywhere.
  */
object SnapshotDiff {

  /** Disposition ledger between keyed snapshots `a` and `b`, both
    * (key, price, status). Factored so the spec can pin each
    * disposition on hand-built fixtures incl. NULL-vs-NULL equality.
    */
  def diffLedger(a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.select(col("key").as("key_a"), col("price").as("price_a"),
        col("status").as("status_a"))
      .join(b.select(col("key").as("key_b"), col("price").as("price_b"),
          col("status").as("status_b")),
        col("key_a") === col("key_b"), "full_outer")
    val disposition = when(col("key_b").isNull, lit("removed"))
      .when(col("key_a").isNull, lit("added"))
      .otherwise(lit("common"))
    val priceChg: Column = !(col("price_a") <=> col("price_b"))
    val statusChg: Column = !(col("status_a") <=> col("status_b"))
    joined
      .select(
        disposition.as("disposition"),
        coalesce(col("key_a"), col("key_b")).as("graft_key"),
        when(disposition === "common" && priceChg, 1L).otherwise(0L)
          .as("graft_price_chg"),
        when(disposition === "common" && statusChg, 1L).otherwise(0L)
          .as("graft_status_chg"))
      .groupBy(col("disposition"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("graft_price_chg")).as("price_changed"),
        sum(col("graft_status_chg")).as("status_changed"),
        sum(when(col("graft_price_chg") + col("graft_status_chg") > 0, 1L)
          .otherwise(0L)).as("any_changed"),
        min(col("graft_key")).as("min_key"),
        max(col("graft_key")).as("max_key"))
  }

  val q194 = Q.of(
    "q194_snapshot_diff",
    """WITH a AS (
      |  SELECT o_orderkey AS key, o_totalprice AS price, o_orderstatus AS status
      |  FROM orders WHERE o_orderkey % 10 <> 0
      |), b AS (
      |  SELECT o_orderkey AS key,
      |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
      |         ELSE o_totalprice END AS price,
      |    CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END AS status
      |  FROM orders WHERE o_orderkey % 10 <> 1
      |), j AS (
      |  SELECT a.key AS key_a, a.price AS price_a, a.status AS status_a,
      |    b.key AS key_b, b.price AS price_b, b.status AS status_b
      |  FROM a FULL OUTER JOIN b ON a.key = b.key
      |), flagged AS (
      |  SELECT
      |    CASE WHEN key_b IS NULL THEN 'removed'
      |         WHEN key_a IS NULL THEN 'added'
      |         ELSE 'common' END AS disposition,
      |    COALESCE(key_a, key_b) AS key,
      |    CASE WHEN key_a IS NOT NULL AND key_b IS NOT NULL
      |      AND price_a IS DISTINCT FROM price_b THEN 1 ELSE 0 END AS price_chg,
      |    CASE WHEN key_a IS NOT NULL AND key_b IS NOT NULL
      |      AND status_a IS DISTINCT FROM status_b THEN 1 ELSE 0 END AS status_chg
      |  FROM j
      |)
      |SELECT disposition, COUNT(*) AS n,
      |  CAST(SUM(price_chg) AS BIGINT) AS price_changed,
      |  CAST(SUM(status_chg) AS BIGINT) AS status_changed,
      |  CAST(SUM(CASE WHEN price_chg + status_chg > 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS any_changed,
      |  MIN(key) AS min_key, MAX(key) AS max_key
      |FROM flagged
      |GROUP BY disposition
      |ORDER BY disposition""".stripMargin) { t =>
    val base = t.orders.select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderstatus"))
    val a = base
      .filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("price"),
        col("o_orderstatus").as("status"))
    val b = base
      .filter(col("o_orderkey") % 10 =!= 1)
      .select(
        col("o_orderkey").as("key"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 1.1)
          .otherwise(col("o_totalprice")).as("price"),
        when(col("o_orderkey") % 13 === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("status"))
    diffLedger(a, b).orderBy(col("disposition"))
  }

  def all: Seq[Q] = Seq(q194)
}
