package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.PageRank

/** q118: fixed-iteration PAGERANK over the part co-purchase graph —
  * the iterative-graph operator class (influence/centrality ranking,
  * the "what anchors this catalog" question the reference's virality
  * analysis (`SQL/Social Network Effects on Content Virality.txt`)
  * approximates with one-hop co-watch counts; PageRank is its
  * fixed-point generalization).
  *
  * Graph: parts are nodes; a directed edge src→dst exists when the two
  * parts co-occur in at least one order (distinct pairs, both
  * directions — symmetric by construction, so every node has
  * outdeg ≥ 1 and the node set is closed under iteration). Edge
  * building is the q75 co-occurrence shape: sum-of-basket² pair
  * generation inside an order, measured linear in basket size.
  *
  * Ranking: [[graft.operators.PageRank.ranks]] — 3 unrolled steps of
  * EXACT fixed-point integer arithmetic (micro-rank units, floor
  * division, 0.85 damping as ×85 div 100), so the oracle replays the
  * identical iteration in DuckDB and hash-matches bit for bit; float
  * PageRank would be order-dependent and unverifiable. Per iteration:
  * one rank exchange keyed on src + one aggregation keyed on dst; the
  * degree-annotated edge frame is cached once and never re-shuffled
  * (bucket it by src on a cluster and the rank join co-locates).
  */
object Graph {

  private val Iters = 3

  val q118 = Q.of(
    "q118_pagerank",
    """WITH pl AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), edges AS (
      |  SELECT DISTINCT a.pk AS src, b.pk AS dst
      |  FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk <> b.pk
      |), deg AS (
      |  SELECT src, count(*) AS outdeg FROM edges GROUP BY src
      |), r0 AS (
      |  SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS rank FROM edges
      |), i1 AS (
      |  SELECT e.dst AS id, 150000 + (85 * SUM(p.rank // d.outdeg)) // 100 AS rank
      |  FROM edges e JOIN r0 p ON p.id = e.src JOIN deg d ON d.src = e.src
      |  GROUP BY e.dst
      |), i2 AS (
      |  SELECT e.dst AS id, 150000 + (85 * SUM(p.rank // d.outdeg)) // 100 AS rank
      |  FROM edges e JOIN i1 p ON p.id = e.src JOIN deg d ON d.src = e.src
      |  GROUP BY e.dst
      |), i3 AS (
      |  SELECT e.dst AS id, 150000 + (85 * SUM(p.rank // d.outdeg)) // 100 AS rank
      |  FROM edges e JOIN i2 p ON p.id = e.src JOIN deg d ON d.src = e.src
      |  GROUP BY e.dst
      |)
      |SELECT i3.id AS part_id, CAST(i3.rank AS BIGINT) AS rank, deg.outdeg
      |FROM i3 JOIN deg ON deg.src = i3.id
      |ORDER BY part_id""".stripMargin) { t =>
    // the edge frame feeds FOUR fan-outs (q118's own degree frame, the
    // final join spine, and PageRank's internal degree + withDeg
    // build); uncached, each consumer re-runs the basket pair
    // aggregate's post-shuffle leg — materialize the slim (src, dst)
    // frame once (guide §2.4; the per-iteration frames inside
    // PageRank.ranks have their own cache)
    val edges = graft.CacheScope.trackedCache(coPurchaseEdges(t.lineitem))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    PageRank.ranks(edges, Iters)
      .join(deg, col("id") === col("src"))
      .select(col("id").as("part_id"), col("rank"), col("outdeg"))
      .orderBy(col("part_id"))
  }

  /** Distinct directed co-purchase edges: parts sharing an order. */
  private[graft] def coPurchaseEdges(lineitem: DataFrame): DataFrame =
    graft.operators.CoOccur.directedEdges(
      lineitem.select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey")

  def all: Seq[Q] = Seq(q118)
}
