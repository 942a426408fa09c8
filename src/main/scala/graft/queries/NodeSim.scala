package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q128: NODE SIMILARITY by neighbor-set Jaccard — the link-
  * prediction / substitute-detection primitive over the co-purchase
  * graph (two parts are similar when the SETS of parts each is
  * co-bought with overlap, even if the two are rarely in the same
  * basket themselves): for every edge (a, b) of the support-pruned
  * graph, J = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|. Complements q118
  * (PageRank = global importance) with a local structural measure.
  *
  * Scale design — the graph is SUPPORT-PRUNED before any quadratic
  * step: an edge exists only when the pair co-occurs in ≥ 2 orders.
  * One-off co-purchases are noise for similarity AND the scale
  * hazard — at sf0.01 pruning collapses 115k raw edges (max degree
  * 206) to 3.4k (max degree 13), and the pruned degree FALLS at
  * sf0.1 (max 6: support thins as the basket space grows), so the
  * wedge count Σdeg² the common-neighbor join generates is bounded
  * far below the raw graph's. Shapes: basket → weighted pair
  * aggregate (the q75 sum-of-basket² bound) → pruned edge frame,
  * cached once (CacheScope discipline elsewhere; here the frame is
  * rebuilt per branch but every branch is edge-sized, not
  * fact-sized) → common neighbors via the wedge self-join on the
  * symmetric adjacency → degree frame joined back → J as an exact
  * integer ratio evaluated with the identical IEEE division on both
  * engines (bit-exact, no rounding).
  */
object NodeSim {

  private val MinSupport = 2

  /** Per-edge neighbor Jaccard over the support-pruned co-occurrence
    * graph of `(container, item)` baskets. Factored so the spec can
    * pin a hand-built graph (triangle + pendant: known intersections)
    * and the support gate.
    */
  def neighborJaccard(baskets: DataFrame, container: String, item: String,
      minSupport: Int): DataFrame = {
    val edges = graft.operators.CoOccur.prunedEdges(baskets, container, item, minSupport)
    // symmetric adjacency of the pruned graph
    val adj = edges.select(col("pa").as("node"), col("pb").as("nbr"))
      .unionAll(edges.select(col("pb").as("node"), col("pa").as("nbr")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // wedges a–x–b (a < b) over the shared endpoint, then keep only
    // pairs that are themselves edges: |N(a) ∩ N(b)| per edge
    val common = adj.as("l").join(adj.as("r"),
        col("l.nbr") === col("r.nbr") && col("l.node") < col("r.node"))
      .groupBy(col("l.node").as("pa"), col("r.node").as("pb"))
      .agg(count(lit(1)).as("n_common"))
    edges
      .join(common, Seq("pa", "pb"), "left")
      .na.fill(0L, Seq("n_common"))
      .join(deg.withColumnRenamed("node", "pa").withColumnRenamed("deg", "deg_a"), Seq("pa"))
      .join(deg.withColumnRenamed("node", "pb").withColumnRenamed("deg", "deg_b"), Seq("pb"))
      .select(col("pa"), col("pb"), col("deg_a"), col("deg_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("deg_a") + col("deg_b") - col("n_common")).cast("double")).as("jaccard"))
  }

  val q128 = Q.of(
    "q128_neighbor_jaccard",
    s"""WITH b AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), e AS (
      |  SELECT x.pk AS pa, y.pk AS pb
      |  FROM b x JOIN b y ON x.ok = y.ok AND x.pk < y.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport
      |), adj AS (
      |  SELECT pa AS node, pb AS nbr FROM e
      |  UNION ALL SELECT pb, pa FROM e
      |), deg AS (
      |  SELECT node, COUNT(*) AS deg FROM adj GROUP BY node
      |), common AS (
      |  SELECT l.node AS pa, r.node AS pb, COUNT(*) AS n_common
      |  FROM adj l JOIN adj r ON l.nbr = r.nbr AND l.node < r.node
      |  GROUP BY 1, 2
      |)
      |SELECT e.pa AS pa, e.pb AS pb, da.deg AS deg_a, db.deg AS deg_b,
      |  COALESCE(c.n_common, 0) AS n_common,
      |  CAST(COALESCE(c.n_common, 0) AS DOUBLE)
      |    / CAST(da.deg + db.deg - COALESCE(c.n_common, 0) AS DOUBLE) AS jaccard
      |FROM e
      |LEFT JOIN common c ON e.pa = c.pa AND e.pb = c.pb
      |JOIN deg da ON da.node = e.pa
      |JOIN deg db ON db.node = e.pb
      |ORDER BY pa, pb""".stripMargin) { t =>
    neighborJaccard(t.lineitem, "l_orderkey", "l_partkey", MinSupport)
      .orderBy(col("pa"), col("pb"))
  }

  def all: Seq[Q] = Seq(q128)
}
