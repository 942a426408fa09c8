package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q245: MARKOV ENTROPY RATE of user journeys (Shannon 1948's
  * source-entropy applied to the q139 empirical chain, public) — the
  * predictability readout of the sequence tier: q139 names the likely
  * next steps, q164 the frequent paths, q124 matches known patterns;
  * the entropy rate H = −Σₛ πₛ Σₜ p(t|s)·log2 p(t|s) compresses all
  * of it into "how many bits does the next step actually carry" —
  * near 0 = scripted funnels (journeys compress, caches hit,
  * recommenders are easy), near log2|states| = noise. Per-state
  * conditional entropies name WHICH states are the unpredictable
  * ones; the global rate is their π-weighted mean.
  *
  * Exactness: with c_st transition counts and c_s = Σₜ c_st, every
  * probability is a ratio of exact int64s; each (s, t) term
  * (c_st/c_s)·log2(c_st/c_s) is one fixed IEEE chain quantized D18_6
  * at the ≤|states|² cell grain before the exact decimal sums (the
  * q129 rule), and H_s / the global rate are single divisions of the
  * exact sums. π weighting collapses to Σ c_st terms over N — no
  * second pass.
  *
  * Scale shape: the q139 plan verbatim — fact → per-user lag window
  * → ≤|states|² cell matrix; everything after runs on ≤25 rows.
  */
object EntropyRate {

  val q245 = Q.of(
    "q245_entropy_rate",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events
      |), cells AS (
      |  SELECT prev_type AS s, event_type AS t, COUNT(*) AS c
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
      |), froms AS (
      |  SELECT s, CAST(SUM(c) AS BIGINT) AS cs FROM cells GROUP BY 1
      |), terms AS (
      |  SELECT cells.s, froms.cs, cells.c,
      |    CAST((CAST(cells.c AS DOUBLE) / CAST(froms.cs AS DOUBLE))
      |      * log2(CAST(cells.c AS DOUBLE) / CAST(froms.cs AS DOUBLE))
      |      AS DECIMAL(18,6)) AS tq
      |  FROM cells JOIN froms ON froms.s = cells.s
      |), hs AS (
      |  SELECT s, MAX(cs) AS n_from,
      |    -CAST(SUM(tq) AS DOUBLE) AS h_bits
      |  FROM terms GROUP BY s
      |), g AS (
      |  SELECT CAST(SUM(n_from) AS BIGINT) AS n,
      |    CAST(SUM(CAST(CAST(n_from AS DOUBLE) * h_bits
      |      AS DECIMAL(18,6))) AS DOUBLE) AS wsum
      |  FROM hs
      |)
      |SELECT hs.s AS state, hs.n_from, hs.h_bits,
      |  g.wsum / CAST(g.n AS DOUBLE) AS entropy_rate
      |FROM hs CROSS JOIN g
      |ORDER BY state""".stripMargin) { t =>
    rate(t.events)
  }

  /** The entropy-rate plan over an events-shaped frame. Factored so
    * the spec can pin the closed forms (deterministic chain → 0,
    * uniform fair-coin chain → exactly 1 bit).
    */
  def rate(events: DataFrame): DataFrame = {
    val seqW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cells = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(seqW))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("s"), col("event_type").as("t"))
      .agg(count(lit(1)).as("c"))
    val froms = cells.groupBy(col("s")).agg(sum(col("c")).cast("long").as("cs"))
    val p = col("c").cast("double") / col("cs").cast("double")
    val terms = cells.join(froms, Seq("s"))
      .select(col("s"), col("cs"), (p * log2(p)).cast(det.D18_6).as("tq"))
    val hs = terms.groupBy(col("s"))
      .agg(max(col("cs")).as("n_from"),
        (-sum(col("tq")).cast("double")).as("h_bits"))
    val g = hs.agg(
      sum(col("n_from")).cast("long").as("n"),
      sum((col("n_from").cast("double") * col("h_bits")).cast(det.D18_6))
        .cast("double").as("wsum"))
    hs.crossJoin(broadcast(g))
      .select(col("s").as("state"), col("n_from"), col("h_bits"),
        (col("wsum") / col("n").cast("double")).as("entropy_rate"))
      .orderBy(col("state"))
  }

  def all: Seq[Q] = Seq(q245)
}
