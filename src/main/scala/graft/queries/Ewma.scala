package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q136: EXPONENTIAL smoothing (EWMA) — the trend-vs-noise separator
  * every ops dashboard runs over daily series (the recursive
  * y_t = α·x_t + (1−α)·y_{t−1} that no single window frame
  * expresses), computed as its 8-term TRUNCATED expansion: weights
  * α(1−α)^k for k = 0..7 over lagged values. With α = 1/2 every
  * weight is an EXACT BINARY fraction (2^−(k+1)), each product
  * integer·2^−k is exact in IEEE, and the fixed left-to-right
  * addition chain is mirrored verbatim in the oracle — so the
  * smoothed series is BIT-EXACT cross-engine with no rounding at
  * all (the q58 explicit-expression discipline applied to a window
  * recurrence). Truncation error is bounded by (1−α)^8 < 0.4 % of
  * the oldest mass; series heads renormalize by the exact binary
  * partial-weight sum, so the first rows are unbiased too.
  *
  * Scale shape: one daily pre-aggregate (map-side combined, output
  * bounded by types × days), then 8 `lag`s in ONE window pass over
  * the bounded frame (single sort per type partition, no
  * self-joins), then a projection. Row-based lags: gaps in the date
  * series smooth over observed rows (the pandas `ewm` convention).
  */
object Ewma {

  private val Lags = 8

  /** Truncated-EWMA over `valCol` per `keyCol` ordered by `ordCol`.
    * Emits the exact binary-weighted smooth + the renormalizing
    * weight sum. Factored so the spec can pin a hand-computed
    * geometric decay and the head renormalization.
    */
  def smooth(df: DataFrame, keyCol: String, ordCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
    // weight 2^-(k+1); contribution lag_k * weight when the lag exists
    val terms = (0 until Lags).map { k =>
      val lagged = lag(col(valCol), k).over(w)
      (lagged.cast("double") * lit(math.pow(2.0, -(k + 1))),
        when(lagged.isNotNull, lit(math.pow(2.0, -(k + 1)))).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduceLeft((a, b) => a + coalesce(b, lit(0.0)))
    val den = terms.map(_._2).reduceLeft(_ + _)
    df.withColumn("ewma", num / den)
  }

  val q136 = Q.of(
    "q136_ewma_smoothing",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2
      |), lagged AS (
      |  SELECT event_type, day, n,
      |    lag(n, 1) OVER w AS l1, lag(n, 2) OVER w AS l2,
      |    lag(n, 3) OVER w AS l3, lag(n, 4) OVER w AS l4,
      |    lag(n, 5) OVER w AS l5, lag(n, 6) OVER w AS l6,
      |    lag(n, 7) OVER w AS l7
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
      |)
      |SELECT event_type, day, n,
      |  (CAST(n AS DOUBLE) * 0.5
      |   + COALESCE(CAST(l1 AS DOUBLE) * 0.25, 0.0)
      |   + COALESCE(CAST(l2 AS DOUBLE) * 0.125, 0.0)
      |   + COALESCE(CAST(l3 AS DOUBLE) * 0.0625, 0.0)
      |   + COALESCE(CAST(l4 AS DOUBLE) * 0.03125, 0.0)
      |   + COALESCE(CAST(l5 AS DOUBLE) * 0.015625, 0.0)
      |   + COALESCE(CAST(l6 AS DOUBLE) * 0.0078125, 0.0)
      |   + COALESCE(CAST(l7 AS DOUBLE) * 0.00390625, 0.0))
      |  / (0.5
      |   + CASE WHEN l1 IS NOT NULL THEN 0.25 ELSE 0.0 END
      |   + CASE WHEN l2 IS NOT NULL THEN 0.125 ELSE 0.0 END
      |   + CASE WHEN l3 IS NOT NULL THEN 0.0625 ELSE 0.0 END
      |   + CASE WHEN l4 IS NOT NULL THEN 0.03125 ELSE 0.0 END
      |   + CASE WHEN l5 IS NOT NULL THEN 0.015625 ELSE 0.0 END
      |   + CASE WHEN l6 IS NOT NULL THEN 0.0078125 ELSE 0.0 END
      |   + CASE WHEN l7 IS NOT NULL THEN 0.00390625 ELSE 0.0 END)
      |  AS ewma
      |FROM lagged
      |ORDER BY event_type, day""".stripMargin) { t =>
    smooth(
      t.events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")),
      "event_type", "day", "n")
      .orderBy(col("event_type"), col("day"))
  }

  def all: Seq[Q] = Seq(q136)
}
