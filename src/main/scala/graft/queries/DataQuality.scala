package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** q93: data-quality contract validation — the dbt-test/Great-
  * Expectations gate every ETL pipeline runs before publishing a
  * table: a set of named row-level rules (range, set-membership,
  * non-null, cross-column) evaluated over the fact table, reported as
  * per-rule violation counts plus the total row base.
  *
  * Scale shape: ALL rules ride ONE scan — each rule becomes a
  * conditional counter in a single zero-group aggregate (map-side
  * partials, one 1-row-per-partition exchange), and the per-rule
  * report rows come from unpivoting that single aggregate row with
  * `stack`. The naive shape (one filter+count job per rule) scans the
  * 100 TB fact N times; this scans it once regardless of rule count.
  * The oracle intentionally takes the naive N-subquery form — two
  * structurally different evaluations of the same contract on the two
  * sides of the hash compare.
  */
object DataQuality {

  /** A named row-level contract rule: `violated` must be true exactly
    * on the rows that BREAK the contract.
    */
  final case class Rule(name: String, violated: Column)

  /** The lineitem publication contract (generator invariants, so the
    * corpus passes with zero violations for most rules — CurationSpec
    * feeds broken fixtures to prove the counters actually count).
    */
  def lineitemRules: Seq[Rule] = Seq(
    Rule("quantity_range", !col("l_quantity").between(1, 50)),
    Rule("price_positive", col("l_extendedprice") <= 0),
    Rule("discount_range", !col("l_discount").between(0.0, 0.1)),
    Rule("returnflag_domain", !col("l_returnflag").isin("A", "N", "R")),
    Rule("shipdate_present", col("l_shipdate").isNull),
    Rule("net_not_above_gross",
      col("l_extendedprice") * (lit(1.0) - col("l_discount")) > col("l_extendedprice")))

  /** One-scan evaluation: rule → conditional count in a single
    * aggregate, unpivoted to (rule, n_violations, n_rows) rows.
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val counters =
      count(lit(1)).as("graft_n_rows") +:
        rules.map(r => sum(when(r.violated, 1L).otherwise(0L)).as(s"graft_v_${r.name}"))
    val one = df.agg(counters.head, counters.tail: _*)
    val stackArgs = rules
      .map(r => s"'${r.name}', graft_v_${r.name}")
      .mkString(", ")
    one.select(expr(
      s"stack(${rules.length}, $stackArgs) as (rule, n_violations)"),
      col("graft_n_rows").as("n_rows"))
  }

  val q93 = Q.of(
    "q93_data_quality",
    """WITH base AS (SELECT COUNT(*) AS n_rows FROM lineitem)
      |SELECT r.rule, r.n_violations, base.n_rows
      |FROM (
      |  SELECT 'quantity_range' AS rule,
      |    (SELECT COUNT(*) FROM lineitem WHERE NOT (l_quantity BETWEEN 1 AND 50)) AS n_violations
      |  UNION ALL SELECT 'price_positive',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= 0)
      |  UNION ALL SELECT 'discount_range',
      |    (SELECT COUNT(*) FROM lineitem WHERE NOT (l_discount BETWEEN 0.0 AND 0.1))
      |  UNION ALL SELECT 'returnflag_domain',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_returnflag NOT IN ('A', 'N', 'R'))
      |  UNION ALL SELECT 'shipdate_present',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL)
      |  UNION ALL SELECT 'net_not_above_gross',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice * (1.0 - l_discount) > l_extendedprice)
      |) r, base
      |ORDER BY rule""".stripMargin) { t =>
    validate(t.lineitem, lineitemRules).orderBy(col("rule"))
  }

  def all: Seq[Q] = Seq(q93)
}
