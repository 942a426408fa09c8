package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.vec

/** q255: TRIPLET-MARGIN / hard-negative-mining audit over the labeled
  * embedding space (Schroff et al. 2015 FaceNet triplet loss, public;
  * hard-negative mining is the standard metric-learning and
  * retrieval-training curation step) — for each query vector: the
  * HARDEST POSITIVE (max cosine among same-label vectors), the
  * HARDEST NEGATIVE (max cosine among different-label vectors), the
  * margin between them, and the count of MARGIN VIOLATIONS
  * (negatives scoring above the hardest positive — the triplets a
  * contrastive trainer would actually learn from, and the rows a
  * label-quality audit flags first). Closes the embedding tier's
  * training-data story: q237/q241 audit geometry, q253 audits the
  * clustering loop, THIS audits the label structure the loss
  * consumes.
  *
  * Determinism: cosines are the q50 sequential-fold doubles
  * (bit-identical cross-engine); MAX over bit-identical doubles and
  * the strict > comparison are exact; outputs round 4 (§6); a query
  * with no same-label peer reports NULL margin and NULL violations
  * on both engines.
  *
  * Scale shape (the q50 doctrine): the bounded query set rides a
  * one-row-per-query broadcast against the streamed corpus (the
  * whitelisted brute-force BNLJ — the LSH/IVF tiers are the scale
  * path for a growing query set); the scored frame is cached SLIM
  * (ids, labels, one double — never the vectors) because the
  * violation count needs a second pass keyed on the first pass's
  * per-query max; both folds are map-side combined.
  */
object TripletMargin {

  val q255 = Q.of(
    "q255_triplet_margin",
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), q AS (
      |  SELECT vec_id AS query_id, label AS qlabel, v AS qv
      |  FROM e WHERE vec_id % 50 = 0
      |), s AS (
      |  SELECT query_id, qlabel, e.vec_id, e.label,
      |    list_dot_product(qv, v)
      |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v)))
      |      AS cos
      |  FROM q JOIN e ON e.vec_id <> query_id
      |), hp AS (
      |  SELECT query_id, qlabel,
      |    MAX(CASE WHEN label = qlabel THEN cos END) AS hp,
      |    MAX(CASE WHEN label <> qlabel THEN cos END) AS hn
      |  FROM s GROUP BY 1, 2
      |), vio AS (
      |  SELECT s.query_id, COUNT(*) AS n_violations
      |  FROM s JOIN hp ON hp.query_id = s.query_id
      |  WHERE s.label <> s.qlabel AND s.cos > hp.hp
      |  GROUP BY 1
      |)
      |SELECT hp.query_id, hp.qlabel AS label,
      |  round(hp.hp, 4) AS hardest_positive,
      |  round(hp.hn, 4) AS hardest_negative,
      |  round(hp.hp - hp.hn, 4) AS margin,
      |  CASE WHEN hp.hp IS NULL THEN NULL
      |    ELSE COALESCE(vio.n_violations, 0) END AS n_violations
      |FROM hp LEFT JOIN vio ON vio.query_id = hp.query_id
      |ORDER BY hp.query_id""".stripMargin) { t =>
    margins(t.embeddings
      .select(col("vec_id"), col("label"),
        vec.toDoubleArr(col("embedding")).as("v")))
  }

  /** The margin audit over a (vec_id, label, v) frame. Factored so
    * the spec can pin a planted clean cluster (positive margin, zero
    * violations) and a planted label error (negative margin, counted
    * violations).
    */
  def margins(emb: DataFrame): DataFrame = {
    val e = graft.CacheScope.trackedCache(emb)
    val q = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("v").as("qv"))
    val s = graft.CacheScope.trackedCache(
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("qlabel"), col("vec_id"), col("label"),
          vec.cosim(col("qv"), col("v")).as("cos")))
    val hp = s.groupBy(col("query_id"), col("qlabel")).agg(
      max(when(col("label") === col("qlabel"), col("cos"))).as("hp"),
      max(when(col("label") =!= col("qlabel"), col("cos"))).as("hn"))
    val vio = s
      .join(broadcast(hp.select(col("query_id"), col("hp"))), Seq("query_id"))
      .filter(col("label") =!= col("qlabel") && col("cos") > col("hp"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_violations"))
    hp.join(vio, Seq("query_id"), "left")
      .select(col("query_id"), col("qlabel").as("label"),
        round(col("hp"), 4).as("hardest_positive"),
        round(col("hn"), 4).as("hardest_negative"),
        round(col("hp") - col("hn"), 4).as("margin"),
        when(col("hp").isNull, lit(null).cast("long"))
          .otherwise(coalesce(col("n_violations"), lit(0L))).as("n_violations"))
      .orderBy(col("query_id"))
  }

  def all: Seq[Q] = Seq(q255)
}
