package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det.dsum

/** q123: SCHEMA-DRIFT-tolerant union — the ingestion reality every
  * long-lived 100 TB table lives with: extract generations add (or
  * drop) columns over the years, and the reader must align the
  * generations BY NAME, padding the missing columns with NULL, never
  * by position (a positional union silently mis-binds the moment one
  * generation inserts a column in the middle — the classic corrupted-
  * backfill incident).
  *
  * Modeled here as two generations of the orders extract: the legacy
  * cut (pre-1997) landed without `o_orderpriority`; the current cut
  * carries it. `unionByName(allowMissingColumns = true)` aligns the
  * two frames by column NAME and nulls the legacy gap — the exact
  * semantics of DuckDB's `UNION ALL BY NAME`, which the oracle uses —
  * then one rollup profiles volume/value per priority with the legacy
  * rows surfacing as an explicit '<legacy>' bucket rather than
  * vanishing or poisoning a real priority.
  *
  * Scale shape: both generations are filter-pushed scans of the same
  * parquet (at 100 TB they would be sibling partition trees read by
  * one multi-path scan); the union is a zero-shuffle bag concat —
  * alignment is a per-branch projection, NOT an exchange — and the
  * only shuffle is the final bounded rollup (|priorities|+1 rows).
  * Reference surface: every `CREATE TABLE ... AS SELECT` + later
  * `ALTER TABLE ADD COLUMN` pair in a warehouse implies this read
  * path.
  */
object SchemaDrift {

  val q123 = Q.of(
    "q123_union_schema_drift",
    """WITH legacy AS (
      |  SELECT o_custkey, o_totalprice
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      |), current_gen AS (
      |  SELECT o_custkey, o_totalprice, o_orderpriority
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |), unioned AS (
      |  SELECT * FROM legacy UNION ALL BY NAME SELECT * FROM current_gen
      |)
      |SELECT COALESCE(o_orderpriority, '<legacy>') AS priority,
      |  COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total_value
      |FROM unioned
      |GROUP BY 1
      |ORDER BY priority""".stripMargin) { t =>
    val legacy = t.orders
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_custkey"), col("o_totalprice"))
    val current = t.orders
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
    legacy.unionByName(current, allowMissingColumns = true)
      .groupBy(coalesce(col("o_orderpriority"), lit("<legacy>")).as("priority"))
      .agg(
        count(lit(1)).as("n_orders"),
        count_distinct(col("o_custkey")).as("n_customers"),
        dsum(col("o_totalprice")).as("total_value"))
      .orderBy(col("priority"))
  }

  def all: Seq[Q] = Seq(q123)
}
