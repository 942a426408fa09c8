package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q166: LAG-FEATURE MATRIX — the supervised-learning feature table
  * (one row per user × day with yesterday / last-week / rolling-7d /
  * days-since-activity predictors and tomorrow's count as the label)
  * that sits between raw telemetry and every churn/forecast model:
  * q75 builds profile-grain predictive features; this is the
  * TIME-INDEXED panel with leakage-safe windows (every feature's
  * frame ends at the CURRENT row — nothing from the future leaks
  * into the predictors; the label is the ONLY forward-looking
  * column, and explicitly so).
  *
  * The panel is DENSE per user (calendar spine over each user's own
  * span, zero-filled) — gap days are real training rows ("inactive
  * yesterday" is signal), and without the spine `lag(1)` would mean
  * "previous ACTIVE day", a silently different feature.
  *
  * Scale shape: fact → (user, day) counts in ONE map-side-combined
  * exchange; the spine is a per-user sequence explode (bounded by
  * span × users, the panel's own size); all four features + the
  * label ride ONE user-partitioned window sort. All integers —
  * hash-exact; rolling mean emitted as exact sum + count, division
  * deferred to the consumer (the one place a float would appear).
  */
object LagFeatures {

  /** Leakage-safe daily lag features over (key, day, n) activity.
    * Factored so the spec can pin the zero-fill, each lag, the
    * rolling sum, days-since, and label alignment.
    */
  def panel(activity: DataFrame, keyCol: String, dayCol: String,
      nCol: String): DataFrame = {
    val spine = activity
      .groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("graft_d0"), max(col(dayCol)).as("graft_d1"))
      .select(col(keyCol),
        explode(sequence(col("graft_d0"), col("graft_d1"))).as("day"))
    val dense = spine
      .join(activity.select(col(keyCol), col(dayCol).as("day"), col(nCol).as("graft_n")),
        Seq(keyCol.toString, "day"), "left")
      .withColumn("n_today", coalesce(col("graft_n"), lit(0L)))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val roll7 = w.rowsBetween(-6, 0)
    dense
      .withColumn("n_yesterday", coalesce(lag(col("n_today"), 1).over(w), lit(0L)))
      .withColumn("n_last_week", coalesce(lag(col("n_today"), 7).over(w), lit(0L)))
      .withColumn("sum_7d", sum(col("n_today")).over(roll7))
      .withColumn("n_days_7d", count(lit(1)).over(roll7))
      .withColumn("graft_last_active",
        max(when(col("n_today") > 0, col("day"))).over(w))
      .withColumn("days_since_active",
        when(col("graft_last_active").isNotNull,
          datediff(col("day"), col("graft_last_active"))))
      .withColumn("label_tomorrow", lead(col("n_today"), 1).over(w))
      .filter(col("label_tomorrow").isNotNull)
      .select(col(keyCol), col("day"), col("n_today"), col("n_yesterday"),
        col("n_last_week"), col("sum_7d"), col("n_days_7d"),
        col("days_since_active"), col("label_tomorrow"))
  }

  val q166 = Q.of(
    "q166_lag_features",
    """WITH counts AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2
      |), spine AS (
      |  SELECT user_id,
      |    unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY)) AS day
      |  FROM counts GROUP BY user_id
      |), dense AS (
      |  SELECT s.user_id, CAST(s.day AS DATE) AS day,
      |    COALESCE(c.n, 0) AS n_today
      |  FROM spine s LEFT JOIN counts c
      |    ON s.user_id = c.user_id AND CAST(s.day AS DATE) = c.day
      |), feats AS (
      |  SELECT user_id, day, n_today,
      |    COALESCE(lag(n_today, 1) OVER w, 0) AS n_yesterday,
      |    COALESCE(lag(n_today, 7) OVER w, 0) AS n_last_week,
      |    SUM(n_today) OVER (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sum_7d,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_days_7d,
      |    datediff('day',
      |      MAX(CASE WHEN n_today > 0 THEN day END) OVER w, day)
      |      AS days_since_active,
      |    lead(n_today, 1) OVER w AS label_tomorrow
      |  FROM dense
      |  WINDOW w AS (PARTITION BY user_id ORDER BY day
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT user_id, day,
      |  CAST(n_today AS BIGINT) AS n_today,
      |  CAST(n_yesterday AS BIGINT) AS n_yesterday,
      |  CAST(n_last_week AS BIGINT) AS n_last_week,
      |  CAST(sum_7d AS BIGINT) AS sum_7d,
      |  CAST(n_days_7d AS BIGINT) AS n_days_7d,
      |  CAST(days_since_active AS INTEGER) AS days_since_active,
      |  CAST(label_tomorrow AS BIGINT) AS label_tomorrow
      |FROM feats
      |WHERE label_tomorrow IS NOT NULL
      |ORDER BY user_id, day""".stripMargin) { t =>
    panel(
      t.events.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")),
      "user_id", "day", "n")
      .orderBy(col("user_id"), col("day"))
  }

  def all: Seq[Q] = Seq(q166)
}
