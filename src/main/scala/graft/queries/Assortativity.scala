package graft.queries

import org.apache.spark.sql.functions._

import graft.Q

/** q229: DEGREE ASSORTATIVITY + average-neighbor-degree curve over
  * the support-pruned part co-purchase graph — the degree-mixing
  * member of the graph tier (q118 ranks global importance, q170
  * counts cohesion, q128 scores pairwise similarity; this asks "do
  * hubs connect to hubs or to leaves", Newman 2002, public). The
  * readout is the knn(k) curve — for each degree k, the average
  * degree of the neighbors of degree-k nodes (rising = assortative,
  * falling = disassortative/hub-and-spoke) — plus Newman's global r:
  * the Pearson correlation of endpoint degrees over the
  * both-orientations directed edge list.
  *
  * Determinism: degrees and all five moments are exact int64 sums
  * over the directed edge list (both orientations make Σx = Σy and
  * Σx² = Σy², so r = (m·Σxy − Σx·Σy)/(m·Σxx − Σx²) exactly); the
  * moment PRODUCTS ride double (each int64→double conversion and
  * each double ×/−/÷ is correctly rounded identically on both
  * engines, and a product past 2⁶³ would wrap in Spark but error in
  * DuckDB — the double route is both safe and cross-engine exact);
  * a degree-regular graph (variance term 0, e.g. all isolated edges)
  * is guarded to NULL on both sides instead of NaN-vs-NULL.
  *
  * Scale shape: the edge list is the same support-pruned frame the
  * whole graph tier rides (baskets self-join bounded by per-order
  * fanout, then support ≥ 2); degrees are one groupBy over 2m rows;
  * the knn fold and the 1-row moment fold are both map-side combined.
  * The global r is attached to each curve row from a one-row
  * broadcast — the legitimate crossJoin(broadcast(global agg)) shape.
  */
object Assortativity {

  private val MinSupport = 2

  val q229 = Q.of(
    "q229_assortativity",
    s"""WITH b AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), e AS (
      |  SELECT x.pk AS pa, y.pk AS pb
      |  FROM b x JOIN b y ON x.ok = y.ok AND x.pk < y.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport
      |), dir AS (
      |  SELECT pa AS src, pb AS dst FROM e
      |  UNION ALL SELECT pb, pa FROM e
      |), deg AS (
      |  SELECT src AS node, COUNT(*) AS deg FROM dir GROUP BY 1
      |), ed AS (
      |  SELECT ds.deg AS dx, dd.deg AS dy
      |  FROM dir JOIN deg ds ON ds.node = dir.src
      |  JOIN deg dd ON dd.node = dir.dst
      |), mo AS (
      |  SELECT COUNT(*) AS m,
      |    CAST(SUM(dx) AS BIGINT) AS sx,
      |    CAST(SUM(dx * dx) AS BIGINT) AS sxx,
      |    CAST(SUM(dx * dy) AS BIGINT) AS sxy
      |  FROM ed
      |), knn AS (
      |  SELECT dx AS deg, COUNT(*) AS n_ends,
      |    CAST(SUM(dy) AS BIGINT) AS sum_nbr_deg
      |  FROM ed GROUP BY 1
      |)
      |SELECT knn.deg, knn.n_ends,
      |  CAST(knn.sum_nbr_deg AS DOUBLE) / CAST(knn.n_ends AS DOUBLE)
      |    AS avg_nbr_deg,
      |  CASE WHEN CAST(mo.m AS DOUBLE) * CAST(mo.sxx AS DOUBLE)
      |         - CAST(mo.sx AS DOUBLE) * CAST(mo.sx AS DOUBLE) = 0 THEN NULL
      |    ELSE (CAST(mo.m AS DOUBLE) * CAST(mo.sxy AS DOUBLE)
      |         - CAST(mo.sx AS DOUBLE) * CAST(mo.sx AS DOUBLE))
      |       / (CAST(mo.m AS DOUBLE) * CAST(mo.sxx AS DOUBLE)
      |         - CAST(mo.sx AS DOUBLE) * CAST(mo.sx AS DOUBLE)) END
      |    AS assortativity
      |FROM knn CROSS JOIN mo
      |ORDER BY deg""".stripMargin) { t =>
    curve(graft.operators.CoOccur.prunedEdges(
      t.lineitem.select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", MinSupport))
  }

  /** knn(k) curve + global r over an undirected edge frame (pa, pb).
    * Factored so the spec can pin hand graphs (star r = −1, path,
    * two-cliques-bridge) against Newman's closed forms.
    */
  def curve(e: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val dir = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
    val deg = dir.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    // ed is consumed by BOTH the 1-row moment fold and the knn rollup;
    // uncached, each consumer re-runs the whole edge build (the basket
    // pair aggregate) because the two aggregates shuffle on different
    // keys and share no exchange — cache the slim (dx, dy) frame once
    // (guide §2.4: two ops keyed differently can't share an exchange,
    // so share the materialized input instead)
    val ed = graft.CacheScope.trackedCache(dir
      .join(deg.select(col("node").as("src"), col("deg").as("dx")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("deg").as("dy")), Seq("dst"))
      .select(col("dx"), col("dy")))
    val mo = ed.agg(
      count(lit(1)).as("m"),
      sum(col("dx")).cast("long").as("sx"),
      sum(col("dx") * col("dx")).cast("long").as("sxx"),
      sum(col("dx") * col("dy")).cast("long").as("sxy"))
    val knn = ed.groupBy(col("dx").as("deg"))
      .agg(count(lit(1)).as("n_ends"),
        sum(col("dy")).cast("long").as("sum_nbr_deg"))
    // moment products ride DOUBLE (int64→double and double ×/− are
    // correctly rounded on both engines, so bit-identical) — an int64
    // product past 2⁶³ would silently wrap in Spark but ERROR in
    // DuckDB; and a degree-regular graph (m·Σxx = Σx², e.g. all
    // isolated edges) is guarded to NULL on both sides instead of
    // Spark-NaN vs DuckDB-NULL
    val md = col("m").cast("double")
    val sxd = col("sx").cast("double")
    val den = md * col("sxx").cast("double") - sxd * sxd
    knn.crossJoin(broadcast(mo))
      .select(col("deg"), col("n_ends"),
        (col("sum_nbr_deg").cast("double") / col("n_ends").cast("double"))
          .as("avg_nbr_deg"),
        when(den =!= 0,
          (md * col("sxy").cast("double") - sxd * sxd) / den)
          .as("assortativity"))
      .orderBy(col("deg"))
  }

  def all: Seq[Q] = Seq(q229)
}
