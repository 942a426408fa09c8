package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q154: SHANNON ENTROPY diversity profile — per user, the entropy of
  * their event-type distribution plus Pielou evenness H/ln(k): the
  * behavioral-diversity statistic (is this account a single-action
  * bot or a broad human?) that powers engagement scoring and
  * bot-filter features; the user-grain companion to q131's
  * corpus-grain KL drift.
  *
  * Determinism (the q129/q131 ln discipline, applied to the identity
  * H = ln T − (Σ c·ln c)/T so the only libm calls are on INTEGER
  * arguments): counts c are small integers with FEW distinct values,
  * so each ln(c) is quantized to DECIMAL(18,6), the weighted sum
  * Σ c·lnq(c) is an exact decimal, and the remaining ops (one
  * division, one subtraction, the evenness division) are IEEE on
  * bit-identical operands — no final rounding. A single-type user has
  * H = 0 exactly and NULL evenness (ln 1 = 0 denominator, guarded).
  *
  * Scale shape: ONE map-side-combined (user, type) aggregate — state
  * bounded by the type alphabet — then one bounded per-user rollup.
  * The entropy math never touches the fact.
  */
object Entropy {

  /** Per-key entropy/evenness over a categorical `catCol`. Factored
    * so the spec can pin the uniform maximum (H = ln k), the
    * single-type zero, and the skew ordering.
    */
  def diversity(df: DataFrame, keyCol: String, catCol: String): DataFrame = {
    val lnq = (c: org.apache.spark.sql.Column) => log(c.cast("double")).cast(det.D18_6)
    df
      .groupBy(col(keyCol), col(catCol))
      .agg(count(lit(1)).as("graft_c"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("graft_c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum((col("graft_c") * lnq(col("graft_c"))).cast(det.D28_6)).as("graft_clnc"))
      .select(
        col(keyCol), col("n_events"), col("n_types"),
        (lnq(col("n_events")).cast("double") -
          col("graft_clnc").cast("double") / col("n_events").cast("double"))
          .as("entropy"),
        when(col("n_types") > 1,
          (lnq(col("n_events")).cast("double") -
            col("graft_clnc").cast("double") / col("n_events").cast("double")) /
            lnq(col("n_types")).cast("double"))
          .as("evenness"))
  }

  val q154 = Q.of(
    "q154_entropy_diversity",
    """WITH cells AS (
      |  SELECT user_id, event_type, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2
      |), rolled AS (
      |  SELECT user_id,
      |    SUM(c) AS n_events,
      |    COUNT(*) AS n_types,
      |    SUM(CAST(c * CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(18,6)) AS DECIMAL(28,6)))
      |      AS clnc
      |  FROM cells GROUP BY 1
      |)
      |SELECT user_id,
      |  CAST(n_events AS BIGINT) AS n_events,
      |  CAST(n_types AS BIGINT) AS n_types,
      |  CAST(CAST(ln(CAST(n_events AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE)
      |    - CAST(clnc AS DOUBLE) / CAST(n_events AS DOUBLE) AS entropy,
      |  CASE WHEN n_types > 1 THEN
      |    (CAST(CAST(ln(CAST(n_events AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE)
      |      - CAST(clnc AS DOUBLE) / CAST(n_events AS DOUBLE))
      |    / CAST(CAST(ln(CAST(n_types AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE)
      |  END AS evenness
      |FROM rolled
      |ORDER BY user_id""".stripMargin) { t =>
    diversity(t.events, "user_id", "event_type").orderBy(col("user_id"))
  }

  def all: Seq[Q] = Seq(q154)
}
