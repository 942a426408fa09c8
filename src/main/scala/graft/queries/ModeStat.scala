package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q150: MODE — the most-frequent-value aggregate (per nation, the
  * modal order priority of its customers' orders) with a
  * DETERMINISTIC tiebreak: highest count first, then the
  * lexicographically smallest value. Spark's built-in `mode` and
  * DuckDB's `mode()` both leave ties implementation-defined — an
  * unverifiable aggregate — so the operator is spelled as the
  * counts-frame + rank pattern that pins the tie, the same discipline
  * as q08's top-k (and the only spelling that also yields the
  * runner-up margin, which real dashboards want anyway).
  *
  * Scale shape: ONE map-side-combined (nation, priority) aggregate —
  * output bounded by the two dims' product — with the dim joins
  * BROADCAST into the scan stage; the rank window and share math run
  * over the bounded counts frame only. Share is one IEEE division of
  * exact integers (q139 rule, no rounding).
  */
object ModeStat {

  /** Modal `valCol` per `keyCol` over a pre-joined frame, with
    * count-desc / value-asc tiebreak. Factored so the spec can pin
    * the tie case and the margin arithmetic.
    */
  def mode(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val counts = df
      .groupBy(col(keyCol), col(valCol))
      .agg(count(lit(1)).as("graft_c"))
    val byKey = Window.partitionBy(col(keyCol))
    val rank = Window.partitionBy(col(keyCol))
      .orderBy(col("graft_c").desc, col(valCol))
    counts
      .withColumn("graft_rn", row_number().over(rank))
      .withColumn("n_total", sum(col("graft_c")).over(byKey))
      .withColumn("graft_next", lead(col("graft_c"), 1).over(rank))
      .filter(col("graft_rn") === 1)
      .select(
        col(keyCol),
        col(valCol).as("mode_value"),
        col("graft_c").as("n_mode"),
        col("n_total"),
        (col("graft_c").cast("double") / col("n_total").cast("double")).as("share"),
        (col("graft_c") - coalesce(col("graft_next"), lit(0L))).as("margin"))
  }

  val q150 = Q.of(
    "q150_mode_tiebreak",
    """WITH joined AS (
      |  SELECT n.n_name, o.o_orderpriority
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |), counts AS (
      |  SELECT n_name, o_orderpriority, COUNT(*) AS c
      |  FROM joined GROUP BY 1, 2
      |), ranked AS (
      |  SELECT n_name, o_orderpriority, c,
      |    row_number() OVER (PARTITION BY n_name ORDER BY c DESC, o_orderpriority) AS rn,
      |    SUM(c) OVER (PARTITION BY n_name) AS n_total,
      |    lead(c, 1) OVER (PARTITION BY n_name ORDER BY c DESC, o_orderpriority) AS nxt
      |  FROM counts
      |)
      |SELECT n_name,
      |  o_orderpriority AS mode_value,
      |  CAST(c AS BIGINT) AS n_mode,
      |  CAST(n_total AS BIGINT) AS n_total,
      |  CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
      |  CAST(c - COALESCE(nxt, 0) AS BIGINT) AS margin
      |FROM ranked WHERE rn = 1
      |ORDER BY n_name""".stripMargin) { t =>
    mode(
      t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_orderpriority")),
      "n_name", "o_orderpriority")
      .orderBy(col("n_name"))
  }

  def all: Seq[Q] = Seq(q150)
}
