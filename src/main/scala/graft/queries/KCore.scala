package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q179: K-CORE PEELING (fixed rounds) over the support-pruned part
  * co-purchase graph — the density-tier decomposition completing the
  * graph suite: q118 ranks global importance, q128 scores pairwise
  * similarity, q170 counts local closure; the k-core answers "which
  * parts sit in a subgraph where EVERYONE has ≥ k dense-cluster
  * neighbors?" (the standard cohesion backbone, Seidman 1983,
  * public). Synchronous peeling: each round simultaneously removes
  * every node whose CURRENT degree is < k; what survives R rounds is
  * a superset of the true k-core that the rounds converge onto
  * (monotone: the edge set only shrinks), with each removed node
  * stamped by its elimination round — the "peel depth" readout.
  *
  * FIXED R = 3 rounds, not loop-to-fixpoint: the round count is part
  * of the query contract so the DuckDB oracle can replay the
  * identical unrolled rounds (a data-dependent fixpoint has no
  * engine-independent SQL spelling — the q118 fixed-iteration rule;
  * the spec pins a graph where 3 rounds HAVE converged, and the
  * round-r frames are exposed for the cascade case).
  *
  * Scale shape: one fact-collapsing distinct + one basket self-join
  * builds the support-pruned edge frame ONCE (cached; q128's
  * measured collapse bounds it); each round is a degree aggregate
  * over the CURRENT edge frame + two anti-joins — all bounded by the
  * shrinking edge frame, nothing ever re-touches the fact. Isolated
  * nodes (all edges peeled) are handled by degree-0 fill on the
  * active-node frame, not by the edge aggregate that can't see them.
  * All integers — hash-exact oracle.
  */
object KCore {

  private val MinSupport = 2
  private val K = 3
  private val Rounds = 3

  /** Peel `rounds` synchronous rounds of the (pa, pb) edge frame at
    * threshold `k`. Emits every node of the input graph with its
    * elimination round (0 = survived all rounds, with its final
    * degree; eliminated nodes carry a NULL final degree). Factored so
    * the spec can pin a hand-built core-plus-tendril graph (the
    * 2-round cascade), isolated-node removal, and convergence.
    */
  def corePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // explode instead of union-of-two-projections: one pass over the
    // (cached) edge frame per degree computation instead of two
    def degrees(e: DataFrame): DataFrame =
      e.select(explode(array(col("pa"), col("pb"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("graft_deg"))

    val base = graft.CacheScope.trackedCache(edges)
    // allNodes is cached: it anchors the ACTIVE frame of every round
    // (active_r = allNodes minus the cached removal ledgers, a chain
    // of broadcast anti-joins — the r13 spelling cached a fresh
    // `active` frame per round, a materialization job whose content
    // the tiny rm caches already determine) and the final assembly —
    // uncached, each consumer re-ran the degree aggregate over base.
    val allNodes = graft.CacheScope.trackedCache(
      degrees(base).select(col("node")))

    var rms = Seq.empty[DataFrame]
    var cur = base
    for (r <- 1 to rounds) {
      val deg = degrees(cur)
      // active = allNodes minus earlier removals: the rm frames are
      // cached and tiny, so the anti-join chain re-derives active at
      // each of its single uses per round without the 4^rounds
      // recompute blowup that motivated the caches (rm is still
      // referenced four times a round — ledger, active derivation,
      // both edge anti-joins — and STAYS cached).
      val active = rms.foldLeft(allNodes)((a, rm) =>
        a.join(rm.select(col("node")), Seq("node"), "left_anti"))
      val rm = graft.CacheScope.trackedCache(
        active.join(deg, Seq("node"), "left")
          .filter(coalesce(col("graft_deg"), lit(0L)) < k)
          .select(col("node"), lit(r.toLong).as("elim_round")))
      rms = rms :+ rm
      val next = cur
        .join(rm.select(col("node").as("pa")), Seq("pa"), "left_anti")
        .join(rm.select(col("node").as("pb")), Seq("pb"), "left_anti")
      // the FINAL round's edge frame has exactly one consumer (the
      // final-degree aggregate) — caching it would be a pure write
      cur = if (r < rounds) graft.CacheScope.trackedCache(next) else next
    }
    val removed =
      if (rms.nonEmpty) rms.reduce(_ unionAll _)
      else base.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("elim_round",
            org.apache.spark.sql.types.LongType))))
    val finalDeg = degrees(cur)
    allNodes
      .join(removed, Seq("node"), "left")
      .join(finalDeg, Seq("node"), "left")
      .select(
        col("node"),
        coalesce(col("elim_round"), lit(0L)).as("elim_round"),
        when(col("elim_round").isNull,
          coalesce(col("graft_deg"), lit(0L))).as("final_deg"))
  }

  /** Loop-to-FIXPOINT peel (round-11 production form beside the
    * fixed-round oracle contract): peel until a round removes no
    * node — the true Seidman k-core, with the same output schema as
    * [[corePeel]] (survivors elim_round = 0 + final degree). Peeling
    * is monotone (the edge set only shrinks), so the fixpoint always
    * exists and each non-final round removes ≥ 1 node — termination
    * within |V| rounds is structural; maxRounds is the fail-loud
    * guard against a mis-sized cap, never a silent wrong answer.
    * Returns (result, rounds) where `rounds` counts peeling rounds
    * that removed at least one node. Per round: the same bounded
    * degree aggregate + anti-joins as corePeel, plus ONE count on the
    * round's removal frame (already computed and cached — the
    * convergence test is free beyond that count). Frames are
    * localCheckpoint'd so the loop's plans stay constant-size
    * (Components' 4^rounds recompute-tree lesson). FixpointSpec pins
    * fixpoint ≡ corePeel(·, r) on converged fixtures and the chain
    * cascade's round growth.
    */
  def corePeelToFixpoint(edges: DataFrame, k: Int,
      maxRounds: Int = 64): (DataFrame, Int) = {
    def degrees(e: DataFrame): DataFrame =
      e.select(explode(array(col("pa"), col("pb"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("graft_deg"))

    val base = graft.CacheScope.trackedCache(edges)
    val allNodes = degrees(base).select(col("node")).localCheckpoint(true)

    var active = allNodes
    var cur = base
    var removed = cur.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("elim_round",
          org.apache.spark.sql.types.LongType))))
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val r = rounds + 1
      val deg = degrees(cur)
      val rm = active.join(deg, Seq("node"), "left")
        .filter(coalesce(col("graft_deg"), lit(0L)) < k)
        .select(col("node"), lit(r.toLong).as("elim_round"))
        .localCheckpoint(true)
      if (rm.isEmpty) {
        converged = true
      } else {
        rounds = r
        removed = removed.unionAll(rm).localCheckpoint(true)
        active = active.join(rm.select(col("node")), Seq("node"), "left_anti")
          .localCheckpoint(true)
        cur = cur.join(rm.select(col("node").as("pa")), Seq("pa"), "left_anti")
          .join(rm.select(col("node").as("pb")), Seq("pb"), "left_anti")
          .localCheckpoint(true)
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"KCore.corePeelToFixpoint: still peeling after $maxRounds rounds; " +
          "raise maxRounds")
    val finalDeg = degrees(cur)
    val out = allNodes
      .join(removed, Seq("node"), "left")
      .join(finalDeg, Seq("node"), "left")
      .select(
        col("node"),
        coalesce(col("elim_round"), lit(0L)).as("elim_round"),
        when(col("elim_round").isNull,
          coalesce(col("graft_deg"), lit(0L))).as("final_deg"))
    (out, rounds)
  }

  /** Support-pruned co-purchase edges (pa < pb) — the q128/q170
    * graph. */
  def coEdges(baskets: DataFrame, container: String, item: String,
      minSupport: Int): DataFrame =
    graft.operators.CoOccur.prunedEdges(baskets, container, item, minSupport)

  val q179 = Q.of(
    "q179_kcore_peel",
    s"""WITH b AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), e0 AS MATERIALIZED (
      |  SELECT x.pk AS pa, y.pk AS pb
      |  FROM b x JOIN b y ON x.ok = y.ok AND x.pk < y.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport
      |), nodes AS (
      |  SELECT pa AS node FROM e0 UNION ALL SELECT pb FROM e0
      |), all_nodes AS MATERIALIZED (
      |  SELECT node FROM nodes GROUP BY node
      |), d0 AS (
      |  SELECT node, COUNT(*) AS deg FROM nodes GROUP BY node
      |), rm1 AS MATERIALIZED (
      |  SELECT a.node FROM all_nodes a LEFT JOIN d0 USING (node)
      |  WHERE COALESCE(d0.deg, 0) < $K
      |), e1 AS MATERIALIZED (
      |  SELECT pa, pb FROM e0
      |  WHERE pa NOT IN (SELECT node FROM rm1)
      |    AND pb NOT IN (SELECT node FROM rm1)
      |), a1 AS MATERIALIZED (
      |  SELECT node FROM all_nodes WHERE node NOT IN (SELECT node FROM rm1)
      |), d1 AS (
      |  SELECT node, COUNT(*) AS deg FROM
      |    (SELECT pa AS node FROM e1 UNION ALL SELECT pb FROM e1) GROUP BY node
      |), rm2 AS MATERIALIZED (
      |  SELECT a.node FROM a1 a LEFT JOIN d1 USING (node)
      |  WHERE COALESCE(d1.deg, 0) < $K
      |), e2 AS MATERIALIZED (
      |  SELECT pa, pb FROM e1
      |  WHERE pa NOT IN (SELECT node FROM rm2)
      |    AND pb NOT IN (SELECT node FROM rm2)
      |), a2 AS MATERIALIZED (
      |  SELECT node FROM a1 WHERE node NOT IN (SELECT node FROM rm2)
      |), d2 AS (
      |  SELECT node, COUNT(*) AS deg FROM
      |    (SELECT pa AS node FROM e2 UNION ALL SELECT pb FROM e2) GROUP BY node
      |), rm3 AS MATERIALIZED (
      |  SELECT a.node FROM a2 a LEFT JOIN d2 USING (node)
      |  WHERE COALESCE(d2.deg, 0) < $K
      |), e3 AS MATERIALIZED (
      |  SELECT pa, pb FROM e2
      |  WHERE pa NOT IN (SELECT node FROM rm3)
      |    AND pb NOT IN (SELECT node FROM rm3)
      |), d3 AS (
      |  SELECT node, COUNT(*) AS deg FROM
      |    (SELECT pa AS node FROM e3 UNION ALL SELECT pb FROM e3) GROUP BY node
      |)
      |SELECT n.node,
      |  CAST(CASE
      |    WHEN n.node IN (SELECT node FROM rm1) THEN 1
      |    WHEN n.node IN (SELECT node FROM rm2) THEN 2
      |    WHEN n.node IN (SELECT node FROM rm3) THEN 3
      |    ELSE 0 END AS BIGINT) AS elim_round,
      |  CAST(CASE
      |    WHEN n.node IN (SELECT node FROM rm1) THEN NULL
      |    WHEN n.node IN (SELECT node FROM rm2) THEN NULL
      |    WHEN n.node IN (SELECT node FROM rm3) THEN NULL
      |    ELSE COALESCE(d3.deg, 0) END AS BIGINT) AS final_deg
      |FROM all_nodes n LEFT JOIN d3 USING (node)
      |ORDER BY node""".stripMargin) { t =>
    corePeel(
      coEdges(t.lineitem.select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", MinSupport),
      K, Rounds)
      .orderBy(col("node"))
  }

  def all: Seq[Q] = Seq(q179)
}
