package graft.queries

import org.apache.spark.sql.functions._

import graft.Q

/** q225: BURSTINESS / INDEX OF DISPERSION per event type — the
  * missing temporal-shape member of the time-series tier (q145
  * measures memory via autocorrelation, q138 locates level shifts,
  * q200 flags pointwise anomalies; this asks "is the arrival process
  * Poisson-like or bursty AT ALL" — Fano factor D = σ²/μ of daily
  * counts (D ≈ 1 Poisson, D ≫ 1 bursty) and the Goh–Barabási
  * burstiness coefficient B = (σ−μ)/(σ+μ) ∈ (−1, 1), both public).
  * The day spine is the FULL observed calendar (min..max event date),
  * zero-filled per event type — dispersion over only-active days
  * would systematically understate burstiness.
  *
  * Exactness: daily counts are integers; S1/S2 are exact integer
  * sums, so D = (n·S2 − S1²)/(n·S1) is ONE double division of exact
  * int64s — bit-identical cross-engine with no decimal routing at
  * all. B's σ = sqrt((n·S2 − S1²)/n²) is a fixed IEEE chain over the
  * same exact integers.
  *
  * Scale shape: one events scan folds to (event_type, day) cells
  * (map-side combined); the calendar spine is |days| × |types| rows
  * from a one-row min/max aggregate (the legitimate
  * crossJoin(broadcast(global agg)) shape); output is |types| rows.
  */
object Burstiness {

  val q225 = Q.of(
    "q225_burstiness",
    """WITH bounds AS (
      |  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      |  FROM events
      |), spine AS (
      |  SELECT et.event_type, g.d
      |  FROM (SELECT DISTINCT event_type FROM events) et
      |  CROSS JOIN (SELECT unnest(generate_series(
      |    (SELECT d0 FROM bounds), (SELECT d1 FROM bounds),
      |    INTERVAL 1 DAY))::DATE AS d FROM bounds) g
      |), daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2
      |), cells AS (
      |  SELECT s.event_type, COALESCE(daily.c, 0) AS c
      |  FROM spine s LEFT JOIN daily
      |    ON daily.event_type = s.event_type AND daily.d = s.d
      |), m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(c) AS BIGINT) AS s1,
      |    CAST(SUM(c * c) AS BIGINT) AS s2
      |  FROM cells GROUP BY 1
      |)
      |SELECT event_type, n, s1 AS total_events,
      |  CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * s1 AS DOUBLE) AS fano,
      |  (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / CAST(n AS DOUBLE)
      |     - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |  / (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / CAST(n AS DOUBLE)
      |     + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS burstiness
      |FROM m
      |ORDER BY event_type""".stripMargin) { t =>
    val bounds = t.events.agg(
      min(col("ts").cast("date")).as("graft_d0"),
      max(col("ts").cast("date")).as("graft_d1"))
    val types = t.events.select(col("event_type")).distinct()
    val spine = types
      .join(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("graft_d0"), col("graft_d1"))).as("d"))
    val daily = t.events
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("graft_c"))
    val m = spine
      .join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), coalesce(col("graft_c"), lit(0L)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("c")).cast("long").as("s1"),
        sum(col("c") * col("c")).cast("long").as("s2"))
    val num = (col("n") * col("s2") - col("s1") * col("s1")).cast("double")
    val sigma = sqrt(num) / col("n").cast("double")
    val mu = col("s1").cast("double") / col("n").cast("double")
    m.select(col("event_type"), col("n"), col("s1").as("total_events"),
        (num / (col("n") * col("s1")).cast("double")).as("fano"),
        ((sigma - mu) / (sigma + mu)).as("burstiness"))
      .orderBy(col("event_type"))
  }

  def all: Seq[Q] = Seq(q225)
}
