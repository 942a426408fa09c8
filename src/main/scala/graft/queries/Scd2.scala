package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** q86: slowly-changing-dimension Type-2 merge — the warehouse-ETL
  * core loop: fold an incoming batch of dimension updates into a
  * history-keeping dimension, closing out changed rows (`valid_to` =
  * batch date) and appending the new version, while NO-OPing updates
  * whose tracked attributes are unchanged and inserting never-seen
  * keys as fresh current rows.
  *
  * Inputs are derived deterministically from `customer` on BOTH
  * engines so the merge itself is what the oracle checks:
  *   - snapshot: every customer, valid from 2024-01-01, open-ended;
  *   - updates:  `%10 = 0` keys with a changed balance (+100),
  *               `%10 = 5` keys with IDENTICAL values (the change
  *               detector must not churn these — the classic SCD2
  *               bug is closing/reopening unchanged rows),
  *               `%50 = 7` keys shifted by 1e6 (pure inserts).
  *
  * Scale shape (100 TB dim): ONE full-outer shuffle join on the
  * business key, then each joined row EXPLODES into its 1–2 output
  * rows via a single generated-array projection — not the textbook
  * 4-branch `UNION ALL` over the join (which Catalyst would plan as
  * four joins; the oracle keeps that form, so the two engines reach
  * the same table through structurally different merges). History
  * growth is output-only; no row is wider than the dim row + 3 cols.
  */
object Scd2 {

  val q86 = Q.of(
    "q86_scd2_merge",
    """WITH dim AS (
      |  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      |), upd AS (
      |  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 10 = 5
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 111.0, 'NEW'
      |  FROM customer WHERE c_custkey % 50 = 7
      |), j AS (
      |  SELECT d.c_custkey AS dk, d.c_acctbal AS da, d.c_mktsegment AS ds,
      |         u.c_custkey AS uk, u.c_acctbal AS ua, u.c_mktsegment AS us
      |  FROM dim d FULL OUTER JOIN upd u ON d.c_custkey = u.c_custkey
      |)
      |SELECT * FROM (
      |  SELECT dk AS c_custkey, da AS c_acctbal, ds AS c_mktsegment,
      |         DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
      |         'current' AS row_status
      |  FROM j WHERE dk IS NOT NULL AND (uk IS NULL OR (ua = da AND us = ds))
      |  UNION ALL
      |  SELECT dk, da, ds, DATE '2024-01-01', DATE '2024-06-01', 'closed'
      |  FROM j WHERE dk IS NOT NULL AND uk IS NOT NULL AND (ua != da OR us != ds)
      |  UNION ALL
      |  SELECT dk, ua, us, DATE '2024-06-01', CAST(NULL AS DATE), 'current'
      |  FROM j WHERE dk IS NOT NULL AND uk IS NOT NULL AND (ua != da OR us != ds)
      |  UNION ALL
      |  SELECT uk, ua, us, DATE '2024-06-01', CAST(NULL AS DATE), 'current'
      |  FROM j WHERE dk IS NULL
      |)
      |ORDER BY c_custkey, valid_from""".stripMargin) { t =>
    mergedDim(t.customer).orderBy(col("c_custkey"), col("valid_from"))
  }

  /** The full post-merge history table (q86's output, unsorted) —
    * factored so q108's point-in-time lookup can consume the SCD2
    * result as its dimension side.
    */
  def mergedDim(customer: DataFrame): DataFrame = {
    val cust = customer.select("c_custkey", "c_acctbal", "c_mktsegment")
    val dim = cust
      .select(col("c_custkey").as("dk"), col("c_acctbal").as("da"),
        col("c_mktsegment").as("ds"))
    merge(dim, updatesBatch(cust))
  }

  /** The SCD2 merge itself over (dk, da, ds) × (uk, ua, us) — factored
    * so CurationSpec can craft changed/unchanged/new batches and pin
    * the no-churn invariant directly.
    */
  def merge(dim: DataFrame, upd: DataFrame): DataFrame = {
    dim.join(upd, col("dk") === col("uk"), "full_outer")
      .select(explode(expr(
        """CASE
          |  WHEN uk IS NULL OR (dk IS NOT NULL AND ua = da AND us = ds) THEN
          |    array(named_struct(
          |      'c_custkey', dk, 'c_acctbal', da, 'c_mktsegment', ds,
          |      'valid_from', DATE '2024-01-01', 'valid_to', CAST(NULL AS DATE),
          |      'row_status', 'current'))
          |  WHEN dk IS NULL THEN
          |    array(named_struct(
          |      'c_custkey', uk, 'c_acctbal', ua, 'c_mktsegment', us,
          |      'valid_from', DATE '2024-06-01', 'valid_to', CAST(NULL AS DATE),
          |      'row_status', 'current'))
          |  ELSE array(
          |    named_struct(
          |      'c_custkey', dk, 'c_acctbal', da, 'c_mktsegment', ds,
          |      'valid_from', DATE '2024-01-01', 'valid_to', DATE '2024-06-01',
          |      'row_status', 'closed'),
          |    named_struct(
          |      'c_custkey', dk, 'c_acctbal', ua, 'c_mktsegment', us,
          |      'valid_from', DATE '2024-06-01', 'valid_to', CAST(NULL AS DATE),
          |      'row_status', 'current'))
          |END""".stripMargin)).as("r"))
      .select(col("r.*"))
  }

  /** The incoming batch: changed / identical / brand-new keys, derived
    * from the snapshot so the oracle can derive the same batch.
    */
  private def updatesBatch(cust: DataFrame): DataFrame = {
    val changed = cust.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("uk"),
        (col("c_acctbal") + 100.0).as("ua"), col("c_mktsegment").as("us"))
    val same = cust.filter(col("c_custkey") % 10 === 5)
      .select(col("c_custkey").as("uk"), col("c_acctbal").as("ua"),
        col("c_mktsegment").as("us"))
    val fresh = cust.filter(col("c_custkey") % 50 === 7)
      .select((col("c_custkey") + 1000000L).as("uk"),
        lit(111.0).as("ua"), lit("NEW").as("us"))
    changed.unionAll(same).unionAll(fresh)
  }

  def all: Seq[Q] = Seq(q86)
}
