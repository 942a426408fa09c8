package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.{det, vec}

/** q237: EMBEDDING VARIANCE DECOMPOSITION per label — the law-of-
  * total-variance readout E‖x‖² = ‖E[x]‖² + total variance (public
  * identity): per label the centroid's squared norm (how far the
  * cluster sits from the origin) vs the within-label spread (how
  * diffuse it is). This is the first EXACT-ORACLE query over the
  * embeddings table — the ANN tier (q50–q89) ranks by similarity and
  * is recall-bounded; this audits the GEOMETRY those indexes depend
  * on (a label whose variance dwarfs its centroid norm will shatter
  * across IVF cells; collapsing variance flags embedding-model
  * regression or near-constant vectors before an index is built).
  *
  * Determinism: per-vector ‖x‖² is the sequential left-to-right dot
  * fold both engines share (the q50 rule: `vec.dot` ≡
  * `list_dot_product`); per-dimension component sums ride D18_6
  * quantization + exact decimal addition (the q129 rule — components
  * are unit-scale floats, exactly representable as doubles); per-dim
  * means stay RAW doubles (sum/n of identical exact inputs is
  * bit-identical — re-quantizing that division is the det.scala
  * guaranteed-half-tie class), the centroid norm is the same dot
  * fold over the dim-ORDERED centroid array, and per-vector norm² is
  * quantized once before its exact rollup. No data-ordered double
  * sum anywhere.
  *
  * Scale shape: ONE embeddings scan serves both legs — the norm leg
  * folds in-row (no explode), the centroid leg explodes to
  * (label, dim) cells that map-side-combine to |labels|·dim rows.
  * Output |labels| rows.
  */
object EmbedStats {

  val q237 = Q.of(
    "q237_embed_variance",
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
      |), cn AS (
      |  SELECT label,
      |    list_dot_product(list(mq ORDER BY i), list(mq ORDER BY i))
      |      AS centroid_norm2
      |  FROM dimmean GROUP BY 1
      |), vn AS (
      |  SELECT label, COUNT(*) AS n_vecs,
      |    CAST(SUM(CAST(list_dot_product(v, v) AS DECIMAL(18,6))) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE) AS avg_norm2
      |  FROM e GROUP BY 1
      |)
      |SELECT vn.label, n_vecs, avg_norm2, centroid_norm2,
      |  avg_norm2 - centroid_norm2 AS total_var
      |FROM vn JOIN cn ON cn.label = vn.label
      |ORDER BY vn.label""".stripMargin) { t =>
    decompose(t.embeddings
      .select(col("vec_id"), col("label"),
        vec.toDoubleArr(col("embedding")).as("v")))
  }

  /** The decomposition over a (label, v: array<double>) frame.
    * Factored so the spec can pin the identity on hand clusters
    * (identical vectors → zero variance; symmetric pair → zero
    * centroid) and E‖x‖² = ‖E x‖² + var within quantization.
    */
  def decompose(e: DataFrame): DataFrame = {
    val cells = e
      .select(col("label"), posexplode(col("v")))
      .select(col("label"), col("pos").as("i"),
        col("col").cast(det.D18_6).as("xq"))
    // per-dim means stay RAW doubles (exact decimal sum / int count is
    // bit-identical cross-engine; re-quantizing a sum/n division is
    // the det.scala guaranteed-half-tie class — the q241 lesson), and
    // the norm is the shared sequential dot fold over the dim-ORDERED
    // centroid array — deterministic order, no data-ordered sum
    val m = cells.groupBy(col("label"), col("i"))
      .agg((sum(col("xq")).cast("double") / count(lit(1)).cast("double"))
        .as("mq"))
    val cn = m.groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(i, mq)))," +
        " p -> p.mq)").as("graft_cv"))
      .select(col("label"),
        vec.dot(col("graft_cv"), col("graft_cv")).as("centroid_norm2"))
    val vn = e.groupBy(col("label")).agg(
      count(lit(1)).as("n_vecs"),
      (sum(vec.dot(col("v"), col("v")).cast(det.D18_6)).cast("double")
        / count(lit(1)).cast("double")).as("avg_norm2"))
    vn.join(cn, Seq("label"))
      .select(col("label"), col("n_vecs"), col("avg_norm2"),
        col("centroid_norm2"),
        (col("avg_norm2") - col("centroid_norm2")).as("total_var"))
      .orderBy(col("label"))
  }

  def all: Seq[Q] = Seq(q237)
}
