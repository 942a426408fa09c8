package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

import graft.Q

/** q205: T-CLOSENESS audit — the third rung of the privacy-release
  * ladder (Li, Li & Venkatasubramanian 2007, public): q135 asks "is
  * the group big enough" (k-anonymity), q174 asks "are the sensitive
  * values varied enough" (l-diversity); this asks "does the group's
  * sensitive DISTRIBUTION differ from the corpus's" — a group can be
  * large AND diverse yet still leak (a 90%-delinquent group in a
  * 5%-delinquent corpus tells an attacker plenty). For a categorical
  * sensitive attribute under uniform ground distance the paper's
  * Earth-Mover's Distance reduces to total variation:
  * EMD = ½ Σᵢ |pᵢ − qᵢ|.
  *
  * Determinism: everything rides cleared denominators — with group
  * cells aᵢ (A = Σaᵢ) and global cells bᵢ (B = Σbᵢ),
  * EMD = (Σ_present |aᵢ·B − bᵢ·A| + (B − Σ_present bᵢ)·A) / (2AB);
  * sensitive values ABSENT from the group contribute via the
  * complement term, so no dense domain join is needed. Each product
  * is DECIMAL(18,0) × DECIMAL(18,0) (the q199 decimal-width rule —
  * the 37-digit product stays under the 38-digit ceiling) and the
  * numerator is an exact decimal sum. The at-risk flag EMD > t = ¼
  * is decided as `2·num > A·B` in EXACT decimal arithmetic — no IEEE
  * compare at the boundary; the reported emd is ONE IEEE division of
  * exact operands, token-identical in the oracle.
  *
  * Scale shape: ONE (quasi…, sensitive) map-side-combined aggregate
  * is all that touches the table; the global distribution and group
  * totals are RE-AGGREGATED from those cells (q198's
  * marginals-from-the-joint discipline — never a second scan) and
  * broadcast back onto them. State bounded by the quasi×sensitive
  * domain at any corpus size; output one row per quasi-group.
  */
object TCloseness {

  private val D18 = DataTypes.createDecimalType(18, 0)

  /** Per-(a, b) group t-closeness of sensitive column `s` vs the
    * whole-table distribution. Emits (qa, qb, n, emd, at_risk).
    * Factored so the spec can pin the mirror-of-global zero, a
    * hand-computed concentrated group, and the absent-value
    * complement term.
    */
  def audit(df: DataFrame, a: Column, b: Column, s: Column): DataFrame = {
    val cells = df
      .groupBy(a.as("qa"), b.as("qb"), s.as("graft_s"))
      .agg(count(lit(1)).as("graft_a"))
    val globals = cells
      .groupBy(col("graft_s"))
      .agg(sum(col("graft_a")).cast("long").as("graft_b"))
    val groupTotals = cells
      .groupBy(col("qa"), col("qb"))
      .agg(sum(col("graft_a")).cast("long").as("graft_ga"))
    val grandTotal = globals
      .agg(sum(col("graft_b")).cast("long").as("graft_bt"))
    val num =
      (col("graft_present")
        + (col("graft_bt") - col("graft_pb")).cast(D18) * col("n").cast(D18))
    cells
      .join(broadcast(globals), Seq("graft_s"))
      .join(broadcast(groupTotals), Seq("qa", "qb"))
      .join(broadcast(grandTotal))
      .groupBy(col("qa"), col("qb"))
      .agg(
        max(col("graft_ga")).as("n"),
        sum(abs(col("graft_a").cast(D18) * col("graft_bt").cast(D18)
          - col("graft_b").cast(D18) * col("graft_ga").cast(D18)))
          .as("graft_present"),
        sum(col("graft_b")).cast("long").as("graft_pb"),
        max(col("graft_bt")).as("graft_bt"))
      .select(
        col("qa"), col("qb"), col("n"),
        (num.cast("double")
          / (lit(2.0) * col("n").cast("double") * col("graft_bt").cast("double")))
          .as("emd"),
        // 2·num > A·B without a wide decimal multiply: addition only
        // raises precision by one digit (the q199 width rule).
        (num + num > col("n").cast(D18) * col("graft_bt").cast(D18))
          .as("at_risk"))
  }

  val q205 = Q.of(
    "q205_t_closeness",
    """WITH cells AS (
      |  SELECT c_nationkey AS qa, c_mktsegment AS qb,
      |    CASE WHEN c_acctbal < 0 THEN 'delinquent'
      |         WHEN c_acctbal < 3000 THEN 'standard'
      |         WHEN c_acctbal < 7000 THEN 'plus'
      |         ELSE 'premium' END AS s,
      |    COUNT(*) AS a
      |  FROM customer GROUP BY 1, 2, 3
      |), globals AS (
      |  SELECT s, CAST(SUM(a) AS BIGINT) AS b FROM cells GROUP BY 1
      |), gtot AS (
      |  SELECT qa, qb, CAST(SUM(a) AS BIGINT) AS ga FROM cells GROUP BY 1, 2
      |), grand AS (
      |  SELECT CAST(SUM(b) AS BIGINT) AS bt FROM globals
      |), folded AS (
      |  SELECT qa, qb, MAX(ga) AS n,
      |    SUM(ABS(CAST(a AS DECIMAL(18,0)) * CAST(bt AS DECIMAL(18,0))
      |      - CAST(b AS DECIMAL(18,0)) * CAST(ga AS DECIMAL(18,0)))) AS present,
      |    CAST(SUM(b) AS BIGINT) AS pb,
      |    MAX(bt) AS bt
      |  FROM cells
      |  JOIN globals USING (s)
      |  JOIN gtot USING (qa, qb)
      |  CROSS JOIN grand
      |  GROUP BY 1, 2
      |), e AS (
      |  SELECT qa, qb, n, bt,
      |    present + CAST(bt - pb AS DECIMAL(18,0)) * CAST(n AS DECIMAL(18,0))
      |      AS num
      |  FROM folded
      |)
      |SELECT qa, qb, n,
      |  CAST(num AS DOUBLE) / (2.0 * CAST(n AS DOUBLE) * CAST(bt AS DOUBLE))
      |    AS emd,
      |  num + num > CAST(n AS DECIMAL(18,0)) * CAST(bt AS DECIMAL(18,0))
      |    AS at_risk
      |FROM e
      |ORDER BY qa, qb""".stripMargin) { t =>
    audit(
      t.customer,
      col("c_nationkey"), col("c_mktsegment"),
      when(col("c_acctbal") < 0, "delinquent")
        .when(col("c_acctbal") < 3000, "standard")
        .when(col("c_acctbal") < 7000, "plus")
        .otherwise("premium"))
      .orderBy(col("qa"), col("qb"))
  }

  def all: Seq[Q] = Seq(q205)
}
