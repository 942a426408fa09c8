package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.{det, vec}

/** q241: SIMPLIFIED SILHOUETTE per label over the embeddings table
  * (Rousseeuw 1987; the centroid-based simplification is the standard
  * large-n form, public): s(x) = (b − a)/max(a, b) with a = distance
  * to the OWN label centroid and b = the nearest OTHER centroid —
  * the clustering-quality audit that closes the embeddings oracle
  * tier (q237 measures each label's dispersion in isolation; the
  * silhouette asks whether labels SEPARATE, and its negative-s count
  * names the vectors sitting closer to a foreign centroid — the
  * label-noise readout an embedding-space audit quotes).
  *
  * The full silhouette is O(n²) pairwise; the centroid form is the
  * scale path: distances via ‖x−c‖² = ‖x‖² − 2·x·c + ‖c‖² — three
  * sequential dot folds (the q50 rule: `vec.dot` ≡
  * `list_dot_product`, exact same IEEE chain) against |labels|
  * centroid arrays, never a vector-vector join. Centroids reuse
  * q237's exact machinery (D18_6 component cells → per-dim means →
  * D18_6-quantized array assembled in dim order — Spark
  * sort_array(collect_list(struct)) ≡ DuckDB list(... ORDER BY), the
  * q203 ordered-fold rule); per-vector s is one fixed IEEE chain
  * quantized D18_6 before the exact per-label mean.
  *
  * Scale shape: ONE embeddings scan + a |labels|·dim centroid fold;
  * scoring is a crossJoin against the broadcast |labels|-row centroid
  * frame (the bounded-alphabet shape); output |labels| rows.
  */
object Silhouette {

  val q241 = Q.of(
    "q241_silhouette",
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), cells AS (
      |  SELECT label, unnest(range(1, len(v) + 1)) AS i, v FROM e
      |), comp AS (
      |  SELECT label, i, CAST(v[i] AS DECIMAL(18,6)) AS xq FROM cells
      |), dimmean AS (
      |  SELECT label, i,
      |    CAST(SUM(xq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mq
      |  FROM comp GROUP BY 1, 2
      |), cents AS (
      |  SELECT label AS clabel,
      |    list(mq ORDER BY i) AS cv
      |  FROM dimmean GROUP BY 1
      |), d AS (
      |  SELECT e.vec_id, e.label, cents.clabel,
      |    list_dot_product(v, v) - 2 * list_dot_product(v, cv)
      |      + list_dot_product(cv, cv) AS d2
      |  FROM e CROSS JOIN cents
      |), ab AS (
      |  SELECT vec_id, label,
      |    MAX(CASE WHEN clabel = label THEN
      |      CASE WHEN d2 < 0.0 THEN 0.0 ELSE d2 END END) AS a2,
      |    MIN(CASE WHEN clabel <> label THEN
      |      CASE WHEN d2 < 0.0 THEN 0.0 ELSE d2 END END) AS b2
      |  FROM d GROUP BY 1, 2
      |), s AS (
      |  SELECT vec_id, label,
      |    CAST((sqrt(b2) - sqrt(a2))
      |      / (CASE WHEN sqrt(a2) >= sqrt(b2) THEN sqrt(a2)
      |              ELSE sqrt(b2) END) AS DECIMAL(18,6)) AS sq
      |  FROM ab
      |)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(SUM(sq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS mean_silhouette,
      |  CAST(SUM(CASE WHEN sq < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_negative
      |FROM s GROUP BY label
      |ORDER BY label""".stripMargin) { t =>
    silhouette(t.embeddings
      .select(col("vec_id"), col("label"),
        vec.toDoubleArr(col("embedding")).as("v")))
  }

  /** The silhouette plan over a (vec_id, label, v: array<double>)
    * frame. Factored so the spec can pin separated clusters (s → 1),
    * a planted mislabeled vector (s < 0, counted), and the two-label
    * closed form.
    */
  def silhouette(e0: DataFrame): DataFrame = {
    val e = graft.CacheScope.trackedCache(e0)
    val cells = e
      .select(col("label"), posexplode(col("v")))
      .select(col("label"), col("pos").as("i"),
        col("col").cast(det.D18_6).as("xq"))
    // the mean stays a RAW double: the exact-decimal sum and the
    // integer count convert identically on both engines, so the
    // division is bit-identical — re-quantizing a sum/n division is
    // the det.scala GUARANTEED-half-tie class (measured: one 1e-6
    // flip per ~100 cells at sf0.001)
    val dimmean = cells.groupBy(col("label"), col("i"))
      .agg((sum(col("xq")).cast("double") / count(lit(1)).cast("double"))
        .as("mq"))
    val cents = dimmean.groupBy(col("label").as("clabel"))
      .agg(expr("transform(sort_array(collect_list(struct(i, mq)))," +
        " p -> p.mq)").as("cv"))
    val d = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("clabel"),
        (vec.dot(col("v"), col("v"))
          - lit(2) * vec.dot(col("v"), col("cv"))
          + vec.dot(col("cv"), col("cv"))).as("d2"))
    // analytic d2 >= 0, but the expanded IEEE form can land at -1e-18
    // for a vector sitting ON its centroid — clamp both engines alike
    val clamped = when(col("d2") < 0.0, lit(0.0)).otherwise(col("d2"))
    val ab = d.groupBy(col("vec_id"), col("label"))
      .agg(
        max(when(col("clabel") === col("label"), clamped)).as("a2"),
        min(when(col("clabel") =!= col("label"), clamped)).as("b2"))
    val a = sqrt(col("a2"))
    val b = sqrt(col("b2"))
    val s = ab.select(col("label"),
      ((b - a) / when(a >= b, a).otherwise(b)).cast(det.D18_6).as("sq"))
    s.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        (sum(col("sq")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_silhouette"),
        sum(when(col("sq") < 0, 1L).otherwise(0L)).cast("long")
          .as("n_negative"))
      .orderBy(col("label"))
  }

  def all: Seq[Q] = Seq(q241)
}
