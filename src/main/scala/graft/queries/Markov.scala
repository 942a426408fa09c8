package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q139: MARKOV TRANSITION MATRIX over per-user event sequences —
  * the first-order behavior model (which action follows which)
  * behind next-action prediction, funnel-leak diagnosis, and the
  * q124 sequence patterns' probabilistic generalization: P(next |
  * prev) as an exact integer ratio n(prev→next) / n(prev→·), plus a
  * deterministic rank of each state's successors. The per-user
  * ordering tiebreaks on event_id (ts alone ties within a day-grain
  * generator — the q124 lesson), so the transition multiset is
  * unique and the whole matrix hash-exact; p is ONE IEEE division of
  * bit-identical integers per cell.
  *
  * Scale shape: sequences never leave their user partition — lag
  * runs in the q21/q124 per-user-history window (one shuffle keyed
  * by user), then ONE map-side-combined (prev, next) aggregate whose
  * output is bounded by |states|² (25 cells here), and the
  * denominator/rank windows run over that bounded matrix, never the
  * fact. At 100 TB this is the canonical two-exchange plan: fact →
  * user window → tiny matrix.
  */
object Markov {

  /** (prev, next) transition counts, conditional probabilities, and
    * successor ranks over `typeCol` sequences per `userCol` ordered
    * by (`tsCol`, `idCol`). Factored so the spec can pin a
    * hand-built deterministic chain and the row-normalization
    * invariant Σ_next p = 1.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val seq = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("prev_type", lag(col(typeCol), 1).over(seq))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy(col("prev_type"))
    pairs
      .withColumn("n_from", sum(col("n")).over(byPrev))
      .withColumn("p", col("n").cast("double") / col("n_from").cast("double"))
      .withColumn("rnk", row_number().over(
        byPrev.orderBy(col("n").desc, col("next_type"))).cast("long"))
  }

  val q139 = Q.of(
    "q139_markov_transitions",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events
      |), pairs AS (
      |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      |  FROM seq WHERE prev_type IS NOT NULL
      |  GROUP BY 1, 2
      |)
      |SELECT prev_type, next_type,
      |  CAST(n AS BIGINT) AS n,
      |  CAST(SUM(n) OVER w AS BIGINT) AS n_from,
      |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER w AS DOUBLE) AS p,
      |  CAST(row_number() OVER (PARTITION BY prev_type ORDER BY n DESC, next_type)
      |    AS BIGINT) AS rnk
      |FROM pairs
      |WINDOW w AS (PARTITION BY prev_type)
      |ORDER BY prev_type, next_type""".stripMargin) { t =>
    transitions(t.events, "user_id", "ts", "event_id", "event_type")
      .orderBy(col("prev_type"), col("next_type"))
  }

  def all: Seq[Q] = Seq(q139)
}
