package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q274: HITS hubs-and-authorities (Kleinberg 1999, public) over the
  * bipartite user → item interaction graph (events; items are the
  * `props.k` payload, the q107 grain) — the centrality pair q118's
  * PageRank can't express: a HUB is a user whose interactions
  * concentrate on high-authority items, an AUTHORITY is an item drawing
  * high-hub users, and the two scores are mutually recursive.
  *
  * EXACT fixed-point integer arithmetic (the q118 doctrine): two
  * unrolled mutual-recursion rounds, each half-round one aggregation
  * over the edge frame, with per-round INTEGER NORMALIZATION — score ·
  * 10⁶ div max(score) — so magnitudes stay ≤ 10⁶, every product fits
  * int64 at any SF (h ≤ |items-per-user| · 10⁶), and DuckDB replays
  * the identical div chain bit for bit; float HITS (L2 normalization)
  * would be order-dependent and unverifiable. The max is a one-row
  * broadcast (the q127 pattern), never an empty-partition window.
  *
  * Scale shape: edges = DISTINCT (user, item) — one map-side-combined
  * collapse of the fact; each half-round is one shuffle keyed on user
  * or item (bucket the edge frame by user on a cluster and the
  * alternation co-locates); the final cut is two distributed
  * TakeOrderedAndProject top-20s. Output ≤ 40 rows.
  */
object Hits {

  private val Norm = 1000000L
  private val K = 20

  val q274 = Q.of(
    "q274_hits",
    s"""WITH edges AS (
      |  SELECT DISTINCT user_id AS u, TRY_CAST(props->>'$$.k' AS BIGINT) AS it
      |  FROM events WHERE TRY_CAST(props->>'$$.k' AS BIGINT) IS NOT NULL
      |), a1 AS (
      |  SELECT it, CAST(COUNT(*) AS BIGINT) AS s FROM edges GROUP BY it
      |), a1n AS (
      |  SELECT it, s * $Norm // (SELECT MAX(s) FROM a1) AS s FROM a1
      |), h1 AS (
      |  SELECT u, CAST(SUM(a1n.s) AS BIGINT) AS s
      |  FROM edges JOIN a1n USING (it) GROUP BY u
      |), h1n AS (
      |  SELECT u, s * $Norm // (SELECT MAX(s) FROM h1) AS s FROM h1
      |), a2 AS (
      |  SELECT it, CAST(SUM(h1n.s) AS BIGINT) AS s
      |  FROM edges JOIN h1n USING (u) GROUP BY it
      |), a2n AS (
      |  SELECT it, s * $Norm // (SELECT MAX(s) FROM a2) AS s FROM a2
      |), h2 AS (
      |  SELECT u, CAST(SUM(a2n.s) AS BIGINT) AS s
      |  FROM edges JOIN a2n USING (it) GROUP BY u
      |), h2n AS (
      |  SELECT u, s * $Norm // (SELECT MAX(s) FROM h2) AS s FROM h2
      |), top_a AS (
      |  SELECT 'authority' AS kind, it AS id, s AS score
      |  FROM a2n ORDER BY s DESC, it LIMIT $K
      |), top_h AS (
      |  SELECT 'hub' AS kind, u AS id, s AS score
      |  FROM h2n ORDER BY s DESC, u LIMIT $K
      |)
      |SELECT kind, id, CAST(score AS BIGINT) AS score
      |FROM (SELECT * FROM top_a UNION ALL SELECT * FROM top_h)
      |ORDER BY kind, score DESC, id""".stripMargin) { t =>
    report(t.events)
  }

  /** One integer-normalization step: s → s·10⁶ div max(s), the max as
    * a one-row broadcast.
    */
  private def normalize(df: DataFrame): DataFrame = {
    // the score frame feeds BOTH the max aggregate and the rescale
    // projection — cache it (CacheScope-tracked) or the aggregation
    // upstream runs twice
    val cached = graft.CacheScope.trackedCache(df)
    val mx = cached.agg(max(col("s")).as("graft_mx"))
    cached.crossJoin(broadcast(mx))
      .select(cached.columns.filter(_ != "s").map(col) :+
        expr(s"s * $Norm div graft_mx").as("s"): _*)
  }

  /** The q274 body over an events frame. Factored so the spec can pin
    * the mutual recursion on a hand-built graph (a dense hub and a
    * popular authority must outrank peripheral nodes).
    */
  def report(events: DataFrame): DataFrame = {
    val edges = events
      .select(col("user_id").as("u"),
        get_json_object(col("props"), "$.k").cast("long").as("it"))
      .filter(col("it").isNotNull)
      .distinct()
    fromEdges(edges)
  }

  /** HITS over an explicit (u, it) edge frame (spec entry point). */
  def fromEdges(edges: DataFrame): DataFrame = {
    val cached = graft.CacheScope.trackedCache(edges)
    val a1n = normalize(cached.groupBy(col("it")).agg(count(lit(1)).as("s")))
    val h1n = normalize(cached.join(a1n, "it")
      .groupBy(col("u")).agg(sum(col("s")).as("s")))
    val a2n = normalize(cached.join(h1n, "u")
      .groupBy(col("it")).agg(sum(col("s")).as("s")))
    val h2n = normalize(cached.join(a2n, "it")
      .groupBy(col("u")).agg(sum(col("s")).as("s")))
    val topA = a2n.orderBy(col("s").desc, col("it")).limit(K)
      .select(lit("authority").as("kind"), col("it").as("id"),
        col("s").as("score"))
    val topH = h2n.orderBy(col("s").desc, col("u")).limit(K)
      .select(lit("hub").as("kind"), col("u").as("id"), col("s").as("score"))
    topA.unionAll(topH).orderBy(col("kind"), col("score").desc, col("id"))
  }

  def all: Seq[Q] = Seq(q274)
}
