package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q180: REFERENTIAL-INTEGRITY audit — per foreign-key relationship
  * of the star schema, the orphan ledger: child rows, NULL keys,
  * distinct keys, orphaned keys (no parent), orphaned rows. The
  * dbt-test `relationships` contract (q93 validates single-table
  * rules; this is the CROSS-table leg a warehouse runs before
  * trusting any join) — a silently-orphaned fact key turns every
  * downstream inner join into row loss that no single-table check
  * can see.
  *
  * Scale shape per relationship: the child collapses to a DISTINCT
  * (key, row-count) frame FIRST — one map-side-combined exchange on
  * the 8-byte key, so the parent probe touches distinct keys, never
  * fact rows — then ONE left join against the parent's key column
  * (broadcast for dims; sort-merge on the same 8-byte key for
  * fact-sized parents like orders) and a one-row rollup. NULL keys
  * are ledgered separately (a NULL FK is a modeling signal, not an
  * orphan — it can never match and would otherwise poison the orphan
  * count). The seven audits are independent and union into a 7-row
  * frame; nothing global.
  *
  * The corpus is referentially clean so every orphan count pins 0 —
  * the oracle proves the ABSENCE claim across all seven edges, and
  * RefIntegritySpec feeds synthetic orphans/NULLs to prove the
  * counters count.
  */
object RefIntegrity {

  /** One relationship audit: one row (rel, n_child, n_null, n_keys,
    * n_orphan_keys, n_orphan_rows). `parent` is projected to its key
    * column and deduplicated (dims are unique already; the distinct
    * keeps the contract honest if a parent ever is not).
    */
  def audit(child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String, rel: String): DataFrame = {
    val ck = child
      .groupBy(col(fkCol).as("graft_k"))
      .agg(count(lit(1)).as("graft_cnt"))
    val pk = parent.select(col(pkCol).as("graft_pk")).distinct()
    val matched = col("graft_k").isNotNull
    val orphan = matched && col("graft_pk").isNull
    ck.join(pk, col("graft_k") === col("graft_pk"), "left")
      .agg(
        coalesce(sum(col("graft_cnt")), lit(0L)).as("n_child"),
        coalesce(sum(when(col("graft_k").isNull, col("graft_cnt"))), lit(0L))
          .as("n_null"),
        count(when(matched, lit(1))).as("n_keys"),
        count(when(orphan, lit(1))).as("n_orphan_keys"),
        coalesce(sum(when(orphan, col("graft_cnt"))), lit(0L))
          .as("n_orphan_rows"))
      .select(lit(rel).as("rel"), col("n_child"), col("n_null"),
        col("n_keys"), col("n_orphan_keys"), col("n_orphan_rows"))
  }

  private def oracleBlock(childTable: String, fkCol: String,
      parentTable: String, pkCol: String, rel: String): String =
    s"""SELECT '$rel' AS rel,
       |  CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_child,
       |  CAST(COALESCE(SUM(CASE WHEN k IS NULL THEN cnt END), 0) AS BIGINT) AS n_null,
       |  CAST(COUNT(CASE WHEN k IS NOT NULL THEN 1 END) AS BIGINT) AS n_keys,
       |  CAST(COUNT(CASE WHEN k IS NOT NULL AND pk IS NULL THEN 1 END) AS BIGINT) AS n_orphan_keys,
       |  CAST(COALESCE(SUM(CASE WHEN k IS NOT NULL AND pk IS NULL THEN cnt END), 0) AS BIGINT) AS n_orphan_rows
       |FROM (SELECT $fkCol AS k, COUNT(*) AS cnt FROM $childTable GROUP BY 1) ck
       |LEFT JOIN (SELECT DISTINCT $pkCol AS pk FROM $parentTable) p ON ck.k = p.pk""".stripMargin

  private val edges = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  val q180 = Q.of(
    "q180_ref_integrity",
    edges.map { case (c, fk, p, pk) =>
      oracleBlock(c, fk, p, pk, s"$c.$fk->$p")
    }.mkString("", "\nUNION ALL\n", "\nORDER BY rel")) { t =>
    val tbl = Map[String, DataFrame](
      "lineitem" -> t.lineitem, "orders" -> t.orders, "part" -> t.part,
      "supplier" -> t.supplier, "customer" -> t.customer,
      "nation" -> t.nation, "region" -> t.region)
    edges.map { case (c, fk, p, pk) =>
      audit(tbl(c), fk, tbl(p), pk, s"$c.$fk->$p")
    }.reduce(_ unionAll _).orderBy(col("rel"))
  }

  def all: Seq[Q] = Seq(q180)
}
