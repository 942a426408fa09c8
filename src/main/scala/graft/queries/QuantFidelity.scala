package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.{det, quant, vec}

/** q256: int8 QUANTIZATION-FIDELITY audit — the PRODUCTION quantizer
  * (`graft.functions.QuantizeI8`, the native expression under the
  * q53/q54/q88 ANN tiers) run over every vector, scored by the
  * cosine between the original vector and its int8 image, rolled up
  * per label (n, mean/min/max fidelity). This is the go/no-go audit
  * before trusting the 8×-smaller representation at 100 TB — and it
  * makes the production quantizer itself DuckDB-replayable: the
  * oracle re-derives round-half-EVEN (Math.rint) in SQL (tie iff
  * y = floor(y) + 0.5 exactly → the even neighbor; else
  * floor(y + 0.5)), so a hash match PROVES the native expression's
  * arithmetic, closing the q53 tier's mechanics the way q238/q251/
  * q252 closed the LSH families'.
  *
  * Determinism: max|x| is an order-free fold over exact doubles;
  * x·(127/max|x|) is one IEEE chain; rint ties resolve identically
  * by construction of the SQL emulation; cosine is scale-invariant,
  * so fidelity = cos(v, int8-as-double) needs no dequantization —
  * the q50 sequential fold, quantized D18_6 per vector before the
  * exact decimal per-label sums (q129 rule). A zero vector (all-zero
  * image) guards to NULL on both engines and is excluded from the
  * label fold's mean by SQL NULL semantics — identically.
  *
  * Scale shape: pure per-row map work (two native codegen'd
  * expressions) + ONE map-side-combined label rollup. No joins, no
  * windows, no shuffle beyond the |labels|-row aggregate.
  */
object QuantFidelity {

  val q256 = Q.of(
    "q256_quant_fidelity",
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), m AS (
      |  SELECT vec_id, label, v,
      |    list_max(list_transform(v, x -> abs(x))) AS mx
      |  FROM e
      |), qz AS (
      |  SELECT vec_id, label, v,
      |    CASE WHEN mx = 0 THEN list_transform(v, x -> 0.0)
      |    ELSE list_transform(v, x -> CAST(GREATEST(-127, LEAST(127,
      |      CASE WHEN x * (127.0 / mx) = floor(x * (127.0 / mx)) + 0.5
      |        THEN CASE WHEN CAST(floor(x * (127.0 / mx)) AS BIGINT) % 2 = 0
      |          THEN CAST(floor(x * (127.0 / mx)) AS BIGINT)
      |          ELSE CAST(floor(x * (127.0 / mx)) AS BIGINT) + 1 END
      |        ELSE CAST(floor(x * (127.0 / mx) + 0.5) AS BIGINT) END))
      |      AS DOUBLE)) END AS ql
      |  FROM m
      |), f AS (
      |  SELECT vec_id, label,
      |    CASE WHEN list_dot_product(ql, ql) = 0 THEN NULL
      |    ELSE CAST(CAST(list_dot_product(v, ql)
      |      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(ql, ql)))
      |      AS DECIMAL(18,6)) AS DOUBLE) END AS fid
      |  FROM qz
      |)
      |SELECT label, COUNT(*) AS n_vectors,
      |  CAST(SUM(CAST(fid AS DECIMAL(18,6))) AS DOUBLE)
      |    / CAST(COUNT(fid) AS DOUBLE) AS mean_fidelity,
      |  MIN(fid) AS min_fidelity,
      |  MAX(fid) AS max_fidelity
      |FROM f GROUP BY label
      |ORDER BY label""".stripMargin) { t =>
    fidelity(t.embeddings
      .select(col("vec_id"), col("label"),
        vec.toDoubleArr(col("embedding")).as("v")))
  }

  /** The fidelity rollup over a (vec_id, label, v) frame. Factored so
    * the spec can pin an exactly-representable vector (fidelity 1),
    * the zero-vector NULL guard, and the rint tie emulation.
    */
  def fidelity(emb: DataFrame): DataFrame = {
    val qd = vec.toDoubleArr(quant.quantizeI8(col("v")))
    val f = emb.select(col("vec_id"), col("label"),
      when(vec.dot(qd, qd) === 0, lit(null).cast("double"))
        .otherwise(vec.cosim(col("v"), qd).cast(det.D18_6).cast("double"))
        .as("fid"))
    f.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        (sum(col("fid").cast(det.D18_6)).cast("double")
          / count(col("fid")).cast("double")).as("mean_fidelity"),
        min(col("fid")).as("min_fidelity"),
        max(col("fid")).as("max_fidelity"))
      .orderBy(col("label"))
  }

  def all: Seq[Q] = Seq(q256)
}
