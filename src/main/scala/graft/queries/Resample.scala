package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q163: LINEAR-INTERPOLATION RESAMPLING — irregular observations
  * onto a regular daily grid: for every user × midnight, the value
  * linearly interpolated between the surrounding observations. This
  * is the feature-pipeline step between raw telemetry and anything
  * that wants aligned time series (q101 gap-fills an AGGREGATED
  * series with LOCF; this interpolates the RAW signal at new
  * instants, the other resampling semantics), built from both asof
  * directions at once (q35 backward + q146 forward) in ONE pass.
  *
  * Plan shape: grid rows (user × days of the user's own span —
  * sequence explode, bounded by the calendar) union'd with the
  * observations, ONE user-keyed exchange, one sort; the surrounding
  * observations arrive via two struct-fill windows (running `last`
  * over the preceding frame, `first` over the following — the
  * AsofJoin union-merge doubled up); the interpolation is a pure
  * projection. Grid instants strictly outside the observed span stay
  * NULL (no extrapolation — explicitly pinned).
  *
  * Determinism: times are integer micros; the interpolation
  * v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev) is the
  * identical IEEE expression both sides on bit-identical operands —
  * no rounding; a grid instant landing EXACTLY on an observation has
  * t_next = t_prev and takes v_prev verbatim (guarded — the 0/0
  * trap).
  */
object Resample {

  /** Daily-midnight linear resample of (`tsCol`, `valCol`) per
    * `keyCol`. Factored so the spec can pin the exact midpoint, the
    * on-observation hit, and the no-extrapolation edges.
    */
  def daily(df: DataFrame, keyCol: String, tsCol: String, valCol: String): DataFrame = {
    // null-valued observations are dropped on BOTH sides: the Spark
    // struct fill would carry them atomically but the oracle's paired
    // pt/pv windows would stitch t and v from different rows
    // observations sort BEFORE grid rows at equal instants (side 0 <
    // 1), so a grid point landing exactly on an observation sees it in
    // its PRECEDING frame and takes it verbatim via the pt = t branch
    val obs = df.filter(col(valCol).isNotNull).select(
      col(keyCol),
      unix_micros(col(tsCol)).as("graft_t"),
      lit(0).as("graft_side"),
      col(valCol).as("graft_v"))
    val grid = df
      .groupBy(col(keyCol))
      .agg(min(to_date(col(tsCol))).as("graft_d0"),
        max(to_date(col(tsCol))).as("graft_d1"))
      .select(col(keyCol),
        explode(sequence(col("graft_d0"), col("graft_d1"))).as("graft_day"))
      .select(col(keyCol),
        unix_micros(col("graft_day").cast("timestamp")).as("graft_t"),
        lit(1).as("graft_side"),
        lit(null).cast("double").as("graft_v"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("graft_t"), col("graft_side"))
    val before = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after  = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevS = last(
      when(col("graft_side") === 0,
        struct(col("graft_t").as("t"), col("graft_v").as("v"))),
      ignoreNulls = true).over(before)
    val nextS = first(
      when(col("graft_side") === 0,
        struct(col("graft_t").as("t"), col("graft_v").as("v"))),
      ignoreNulls = true).over(after)
    obs.unionByName(grid)
      .withColumn("graft_prev", prevS)
      .withColumn("graft_next", nextS)
      .filter(col("graft_side") === 1)
      .filter(col("graft_prev").isNotNull &&
        (col("graft_next").isNotNull || col("graft_prev.t") === col("graft_t")))
      .select(
        col(keyCol),
        timestamp_micros(col("graft_t")).cast("date").as("day"),
        when(col("graft_prev.t") === col("graft_t"), col("graft_prev.v"))
          .when(col("graft_next.t") === col("graft_prev.t"), col("graft_prev.v"))
          .otherwise(
            col("graft_prev.v") + (col("graft_next.v") - col("graft_prev.v")) *
              ((col("graft_t") - col("graft_prev.t")).cast("double") /
                (col("graft_next.t") - col("graft_prev.t")).cast("double")))
          .as("value_interp"))
  }

  val q163 = Q.of(
    "q163_linear_resample",
    """WITH obs AS (
      |  SELECT user_id, epoch_us(ts) AS t, 0 AS side, value AS v
      |  FROM events WHERE value IS NOT NULL
      |), grid AS (
      |  SELECT user_id,
      |    epoch_us(CAST(d AS TIMESTAMP)) AS t, 1 AS side,
      |    CAST(NULL AS DOUBLE) AS v
      |  FROM (
      |    SELECT user_id,
      |      unnest(generate_series(MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)),
      |        INTERVAL 1 DAY)) AS d
      |    FROM events GROUP BY user_id
      |  )
      |), u AS (
      |  SELECT * FROM obs UNION ALL BY NAME SELECT * FROM grid
      |), filled AS (
      |  SELECT user_id, t, side,
      |    last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER before AS pt,
      |    last_value(CASE WHEN side = 0 THEN v END IGNORE NULLS) OVER before AS pv,
      |    first_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER after AS nt,
      |    first_value(CASE WHEN side = 0 THEN v END IGNORE NULLS) OVER after AS nv
      |  FROM u
      |  WINDOW
      |    before AS (PARTITION BY user_id ORDER BY t, side
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    after AS (PARTITION BY user_id ORDER BY t, side
      |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT user_id,
      |  CAST(make_timestamp(t) AS DATE) AS day,
      |  CASE WHEN pt = t THEN pv
      |    WHEN nt = pt THEN pv
      |    ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
      |  END AS value_interp
      |FROM filled
      |WHERE side = 1 AND pt IS NOT NULL AND (nt IS NOT NULL OR pt = t)
      |ORDER BY user_id, day""".stripMargin) { t =>
    daily(t.events, "user_id", "ts", "value")
      .orderBy(col("user_id"), col("day"))
  }

  def all: Seq[Q] = Seq(q163)
}
