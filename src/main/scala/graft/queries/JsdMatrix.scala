package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q246: pairwise JENSEN–SHANNON DIVERGENCE matrix between source
  * token distributions (Lin 1991, public) — the symmetric, bounded
  * [0, 1]-bit distance the mixture tier quotes between corpus slices:
  * q131 measures each source against the pooled corpus (KL, asymmetric,
  * unbounded); the JSD matrix answers "which sources are
  * interchangeable and which are genuinely different material" — the
  * input a mixture planner (q184) or a dedup prioritizer reads.
  *
  * The missing-mass algebra that keeps the join INNER: for terms in P
  * but not Q, the JSD integrand p·log2(2p/(p+q)) collapses to p·1 —
  * so JSD = ½·[Σ_shared (p·log2(2p/(p+q)) + q·log2(2q/(p+q)))
  * + (1 − Pm) + (1 − Qm)], with Pm/Qm the shared-vocabulary mass of
  * each side. No full-outer join, no zero-filled vocab spine — the
  * pair frame is C(|sources|, 2) × |shared vocab|, bounded by the
  * source alphabet (20 here; at 100 TB sources are a catalog, not
  * data).
  *
  * Exactness: p, q are ratios of exact int64s; each shared-term
  * integrand and each mass term is one fixed IEEE chain quantized
  * D18_6 at the (a, b, term) grain before the exact decimal sums
  * (the q129 rule); the final ½ fold is one chain over the exact
  * sums.
  */
object JsdMatrix {

  val q246 = Q.of(
    "q246_jsd_matrix",
    """WITH ts AS (
      |  SELECT source, term, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term
      |    FROM documents WHERE length(trim(text)) > 0
      |  ) GROUP BY 1, 2
      |), ns AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM ts GROUP BY 1
      |), pairs AS (
      |  SELECT a.source AS sa, b.source AS sb, a.term,
      |    CAST(a.c AS DOUBLE) / CAST(na.n AS DOUBLE) AS p,
      |    CAST(b.c AS DOUBLE) / CAST(nb.n AS DOUBLE) AS q
      |  FROM ts a JOIN ts b ON b.term = a.term AND a.source < b.source
      |  JOIN ns na ON na.source = a.source
      |  JOIN ns nb ON nb.source = b.source
      |), shared AS (
      |  SELECT sa, sb, COUNT(*) AS n_shared,
      |    CAST(SUM(CAST(p * log2(2.0 * p / (p + q))
      |      + q * log2(2.0 * q / (p + q)) AS DECIMAL(18,6))) AS DOUBLE) AS sj,
      |    CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS pm,
      |    CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) AS qm
      |  FROM pairs GROUP BY 1, 2
      |), spine AS (
      |  SELECT x.source AS sa, y.source AS sb
      |  FROM ns x JOIN ns y ON x.source < y.source
      |)
      |SELECT spine.sa AS source_a, spine.sb AS source_b,
      |  COALESCE(shared.n_shared, 0) AS n_shared,
      |  0.5 * (COALESCE(shared.sj, 0.0) + (1.0 - COALESCE(shared.pm, 0.0))
      |       + (1.0 - COALESCE(shared.qm, 0.0))) AS jsd_bits
      |FROM spine LEFT JOIN shared
      |  ON shared.sa = spine.sa AND shared.sb = spine.sb
      |ORDER BY source_a, source_b""".stripMargin) { t =>
    matrix(t.documents)
  }

  /** The JSD fold over a (source, text) frame. Factored so the spec
    * can pin identical distributions (0), disjoint vocabularies
    * (exactly 1 bit), and a hand half-overlap value.
    */
  def matrix(docs: DataFrame): DataFrame = {
    val ts = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
    val ns = ts.groupBy(col("source")).agg(sum(col("c")).cast("long").as("n"))
    val a = ts.join(ns, Seq("source"))
      .select(col("source").as("sa"), col("term"),
        (col("c").cast("double") / col("n").cast("double")).as("p"))
    val b = ts.join(ns, Seq("source"))
      .select(col("source").as("sb"), col("term"),
        (col("c").cast("double") / col("n").cast("double")).as("q"))
    val pairs = a.join(b, Seq("term")).filter(col("sa") < col("sb"))
    val integrand =
      col("p") * log2(lit(2.0) * col("p") / (col("p") + col("q"))) +
        col("q") * log2(lit(2.0) * col("q") / (col("p") + col("q")))
    val shared = pairs.groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("n_shared"),
        sum(integrand.cast(det.D18_6)).cast("double").as("sj"),
        sum(col("p").cast(det.D18_6)).cast("double").as("pm"),
        sum(col("q").cast(det.D18_6)).cast("double").as("qm"))
    // pair SPINE from the source alphabet: a fully-disjoint pair has
    // zero shared rows and must still emit — with pm = qm = 0 the
    // missing-mass algebra yields exactly 1 bit, the JSD maximum
    val spine = ns.select(col("source").as("sa")).as("x")
      .join(ns.select(col("source").as("sb")).as("y"),
        col("sa") < col("sb"))
    spine.join(shared, Seq("sa", "sb"), "left")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (lit(0.5) * (coalesce(col("sj"), lit(0.0))
          + (lit(1.0) - coalesce(col("pm"), lit(0.0)))
          + (lit(1.0) - coalesce(col("qm"), lit(0.0))))).as("jsd_bits"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def all: Seq[Q] = Seq(q246)
}
