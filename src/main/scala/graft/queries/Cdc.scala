package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** q94: CDC changelog → current-snapshot materialization — the other
  * half of the warehouse merge story next to [[Scd2]]: given a base
  * snapshot and an ordered stream of row-level change events
  * (upsert / delete, each stamped with a monotone sequence number),
  * produce the table as it stands after the last change. This is the
  * Debezium/Delta-`MERGE` consumption loop every lakehouse ETL runs.
  *
  * Semantics: per business key, the HIGHEST-seq op wins outright —
  * a later upsert resurrects a deleted key, a later delete kills an
  * earlier upsert, and keys never mentioned in the log pass through
  * from the base unchanged. The log is derived deterministically from
  * `orders` on BOTH engines so the oracle checks the apply machinery,
  * not a fixture: seq 1 upserts (%10=1), seq 2 deletes (%20=2) and
  * brand-new inserts (+10M keys), seq 3 re-upserts half the seq-1
  * keys (%20=1 — latest-wins must pick these), seq 4 resurrections of
  * a quarter of the deleted keys (%40=2 — upsert-after-delete).
  *
  * Scale shape (100 TB base, ~GB/day changelog): the log is reduced
  * to one row per touched key with `max(struct(seq, …))` — a HASH
  * AGGREGATE with map-side partial combine, NOT the textbook
  * `row_number` window (which ships every log row through a shuffle
  * before discarding the losers; the oracle keeps that form, so the
  * two engines reach the snapshot through structurally different
  * reductions). The reduced log then left-joins the base on the key:
  * when the day's touched-key set is small (the normal case) AQE
  * broadcasts it and the 100 TB base is NEVER shuffled — snapshot
  * materialization costs one base scan. Inserts arrive as the
  * right-anti residue of the same reduced frame. No hint is forced;
  * a backfill-sized log degrades to a shuffle join instead of OOM.
  */
object Cdc {

  val q94 = Q.of(
    "q94_cdc_apply",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_custkey, o_totalprice, o_orderstatus
      |  FROM orders
      |), log AS (
      |  SELECT 1 AS seq, 'U' AS op, o_orderkey AS k, o_custkey,
      |         o_totalprice + 50.0 AS o_totalprice, 'U1' AS o_orderstatus
      |  FROM orders WHERE o_orderkey % 10 = 1
      |  UNION ALL
      |  SELECT 2, 'D', o_orderkey, CAST(NULL AS BIGINT),
      |         CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
      |  FROM orders WHERE o_orderkey % 20 = 2
      |  UNION ALL
      |  SELECT 2, 'U', o_orderkey + 10000000, o_custkey, 99.0, 'NEW'
      |  FROM orders WHERE o_orderkey % 50 = 3
      |  UNION ALL
      |  SELECT 3, 'U', o_orderkey, o_custkey,
      |         o_totalprice + 75.0, 'U2'
      |  FROM orders WHERE o_orderkey % 20 = 1
      |  UNION ALL
      |  SELECT 4, 'U', o_orderkey, o_custkey,
      |         o_totalprice + 200.0, 'BACK'
      |  FROM orders WHERE o_orderkey % 40 = 2
      |), last AS (
      |  SELECT * FROM (
      |    SELECT seq, op, k, o_custkey, o_totalprice, o_orderstatus,
      |           ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      |    FROM log)
      |  WHERE rn = 1
      |)
      |SELECT * FROM (
      |  SELECT b.k AS o_orderkey, b.o_custkey, b.o_totalprice,
      |         b.o_orderstatus, CAST(0 AS BIGINT) AS version
      |  FROM base b LEFT JOIN last l ON b.k = l.k WHERE l.k IS NULL
      |  UNION ALL
      |  SELECT k, o_custkey, o_totalprice, o_orderstatus,
      |         CAST(seq AS BIGINT)
      |  FROM last WHERE op = 'U'
      |)
      |ORDER BY o_orderkey""".stripMargin) { t =>
    val o = t.orders.select("o_orderkey", "o_custkey", "o_totalprice",
      "o_orderstatus")
    apply(
      o.select(col("o_orderkey").as("k"), col("o_custkey"),
        col("o_totalprice"), col("o_orderstatus")),
      changelog(o))
      .orderBy("o_orderkey")
  }

  /** The apply machinery itself, factored for CurationSpec's crafted
    * logs (delete-then-upsert resurrection, upsert-then-delete,
    * untouched passthrough). `base` carries (k, payload...); `log`
    * carries (seq, op ∈ {U, D}, k, payload...) with at most one op per
    * (k, seq) — `max(struct(seq, …))` makes the reduction total and
    * deterministic under that contract.
    */
  def apply(base: DataFrame, log: DataFrame): DataFrame = {
    val payload = base.columns.filter(_ != "k").toSeq
    val packed: Column = struct(
      (col("seq") +: col("op") +: payload.map(col)): _*)
    // Hash-aggregate latest-wins: partial max per map task, |touched
    // keys| rows through the exchange — never the full log.
    val last = log.groupBy("k").agg(max(packed).as("w"))
      .select(col("k").as("lk"), col("w.seq").as("seq"),
        col("w.op").as("op"),
        struct(payload.map(p => col(s"w.$p").as(p)): _*).as("p"))
    val joined = base.join(last, col("k") === col("lk"), "full_outer")
    val untouchedOrUpserted = joined
      .filter(col("lk").isNull || col("op") === "U")
      .select(
        (coalesce(col("k"), col("lk")).as("o_orderkey") +:
          payload.map(p =>
            when(col("lk").isNull, col(p))
              .otherwise(col(s"p.$p")).as(p)) :+
          coalesce(col("seq"), lit(0L)).cast("long").as("version")): _*)
    untouchedOrUpserted
  }

  /** The deterministic changelog (mirrors the oracle CTE verbatim). */
  private def changelog(o: DataFrame): DataFrame = {
    val u1 = o.filter(col("o_orderkey") % 10 === 1)
      .select(lit(1).as("seq"), lit("U").as("op"),
        col("o_orderkey").as("k"), col("o_custkey"),
        (col("o_totalprice") + 50.0).as("o_totalprice"),
        lit("U1").as("o_orderstatus"))
    val d2 = o.filter(col("o_orderkey") % 20 === 2)
      .select(lit(2).as("seq"), lit("D").as("op"),
        col("o_orderkey").as("k"),
        lit(null).cast("long").as("o_custkey"),
        lit(null).cast("double").as("o_totalprice"),
        lit(null).cast("string").as("o_orderstatus"))
    val i2 = o.filter(col("o_orderkey") % 50 === 3)
      .select(lit(2).as("seq"), lit("U").as("op"),
        (col("o_orderkey") + 10000000L).as("k"), col("o_custkey"),
        lit(99.0).as("o_totalprice"), lit("NEW").as("o_orderstatus"))
    val u3 = o.filter(col("o_orderkey") % 20 === 1)
      .select(lit(3).as("seq"), lit("U").as("op"),
        col("o_orderkey").as("k"), col("o_custkey"),
        (col("o_totalprice") + 75.0).as("o_totalprice"),
        lit("U2").as("o_orderstatus"))
    val u4 = o.filter(col("o_orderkey") % 40 === 2)
      .select(lit(4).as("seq"), lit("U").as("op"),
        col("o_orderkey").as("k"), col("o_custkey"),
        (col("o_totalprice") + 200.0).as("o_totalprice"),
        lit("BACK").as("o_orderstatus"))
    u1.unionAll(d2).unionAll(i2).unionAll(u3).unionAll(u4)
  }

  def all: Seq[Q] = Seq(q94)
}
