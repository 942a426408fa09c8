package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q170: TRIANGLE COUNT + local clustering coefficient over the
  * support-pruned part co-purchase graph — the graph-cohesion
  * readout beside q118 (PageRank = global importance) and q128
  * (neighbor Jaccard = pairwise similarity): a part whose neighbors
  * are also co-bought with EACH OTHER anchors a dense substitute
  * cluster, while a high-degree / zero-triangle part is a hub
  * bridging unrelated baskets (the reference's catalog analyses
  * read exactly this hub-vs-cluster distinction off co-watch
  * counts; cc(v) = 2·T(v)/(deg(v)·(deg(v)−1)) is its standard
  * normalization, Watts–Strogatz 1998, public).
  *
  * Scale design — the classic quadratic hazard is wedge generation
  * (Σ deg²). Two independent bounds: (1) the graph is SUPPORT-PRUNED
  * first (q128's measured collapse: 115k raw edges → 3.4k at
  * sf0.01, and pruned max degree FALLS with SF); (2) wedges are
  * generated only from the DEGREE-ORDERED orientation (each edge
  * points low → high (deg, id)), whose out-degree is O(√m) in ANY
  * graph, so wedge volume is O(m^1.5) worst case instead of Σ deg²
  * (Chiba–Nishizeki / Schank's forward algorithm, public). Each
  * wedge (u→v, u→w), v < w, closes into a triangle iff canonical
  * edge (v, w) exists — one equi-join against the cached edge
  * frame; no candidate survives that isn't a real triangle. The
  * edge frame is consumed by four branches (degree, orientation,
  * closure probe, output spine) — cached once via CacheScope.
  *
  * Determinism: triangle enumeration order differs between engines
  * but the triangle SET is identical (orientation is a bijection on
  * triangles); counts are exact integers and cc is ONE IEEE division
  * of exact integers (bit-equal both engines, q128 rule); deg = 1
  * nodes get cc = 0 explicitly (a 0/0 division would be
  * engine-defined). Hash-exact oracle.
  */
object Triangles {

  private val MinSupport = 2

  /** Per-node triangle count and clustering coefficient over the
    * support-pruned co-occurrence graph of `(container, item)`
    * baskets. Factored so the spec can pin a hand-built graph
    * (triangle + pendant + square: known counts, the zero-triangle
    * cycle) and a random differential vs brute-force enumeration.
    */
  def perNode(baskets: DataFrame, container: String, item: String,
      minSupport: Int): DataFrame = {
    val edges = graft.CacheScope.trackedCache(
      graft.operators.CoOccur.prunedEdges(baskets, container, item, minSupport))
    val deg = edges.select(col("pa").as("node"))
      .unionAll(edges.select(col("pb").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient each edge from the (deg, id)-smaller endpoint; pa < pb
    // already, so a degree tie keeps the id order
    val oriented = edges
      .join(deg.withColumnRenamed("node", "pa").withColumnRenamed("deg", "graft_da"), Seq("pa"))
      .join(deg.withColumnRenamed("node", "pb").withColumnRenamed("deg", "graft_db"), Seq("pb"))
      .select(
        when(col("graft_da") <= col("graft_db"), col("pa")).otherwise(col("pb")).as("src"),
        when(col("graft_da") <= col("graft_db"), col("pb")).otherwise(col("pa")).as("dst"))
    // wedges u→v, u→w (v < w by id) close iff canonical (v, w) is an edge
    val tri = oriented.as("l")
      .join(oriented.as("r"),
        col("l.src") === col("r.src") && col("l.dst") < col("r.dst"))
      .select(col("l.src").as("u"), col("l.dst").as("v"), col("r.dst").as("w"))
      .join(edges, col("v") === col("pa") && col("w") === col("pb"))
      .select(col("u"), col("v"), col("w"))
    val perNodeTri = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg
      .join(perNodeTri, Seq("node"), "left")
      .na.fill(0L, Seq("n_tri"))
      .select(
        col("node"),
        col("deg"),
        col("n_tri"),
        when(col("deg") >= 2,
          (col("n_tri") * 2).cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double"))
          .otherwise(lit(0.0)).as("clustering"))
  }

  val q170 = Q.of(
    "q170_triangle_count",
    s"""WITH b AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), e AS (
      |  SELECT x.pk AS pa, y.pk AS pb
      |  FROM b x JOIN b y ON x.ok = y.ok AND x.pk < y.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport
      |), deg AS (
      |  SELECT node, COUNT(*) AS deg
      |  FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
      |  GROUP BY node
      |), tri AS (
      |  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      |  FROM e e1
      |  JOIN e e2 ON e2.pa = e1.pb
      |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
      |), pn AS (
      |  SELECT node, COUNT(*) AS n_tri
      |  FROM (SELECT a AS node FROM tri
      |        UNION ALL SELECT b FROM tri
      |        UNION ALL SELECT c FROM tri)
      |  GROUP BY node
      |)
      |SELECT d.node AS node, d.deg,
      |  CAST(COALESCE(pn.n_tri, 0) AS BIGINT) AS n_tri,
      |  CASE WHEN d.deg >= 2
      |    THEN CAST(2 * COALESCE(pn.n_tri, 0) AS DOUBLE)
      |      / CAST(d.deg * (d.deg - 1) AS DOUBLE)
      |    ELSE 0.0 END AS clustering
      |FROM deg d LEFT JOIN pn ON pn.node = d.node
      |ORDER BY node""".stripMargin) { t =>
    perNode(t.lineitem, "l_orderkey", "l_partkey", MinSupport)
      .orderBy(col("node"))
  }

  def all: Seq[Q] = Seq(q170)
}
