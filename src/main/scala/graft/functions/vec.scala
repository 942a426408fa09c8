package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column algebra over `array<float>` embeddings.
  *
  * Built on the higher-order functions `zip_with` / `aggregate`, which
  * evaluate as a sequential left fold in array order inside codegen —
  * the same evaluation order DuckDB's list_dot_product uses, so
  * double-precision dot products are bit-identical across engines
  * (verified empirically; q50's oracle depends on it).
  *
  * Floats are widened to double before any arithmetic: float→double is
  * exact, and it keeps Spark and DuckDB from accumulating in different
  * precisions.
  */
object vec {
  /** array<float> → array<double> (exact widening). */
  def toDoubleArr(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the higher-order-function fold — reference
    * implementation; use [[cosim]] in any hot path.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity via the native codegen'd
    * [[graft.functions.CosineSimilarity]] expression — one fused
    * primitive loop, no boxing. Bit-identical to
    * `dot(a,b) / (norm(a) * norm(b))` (same sequential accumulation
    * order), so oracle-checked queries can use it freely.
    */
  def cosim(a: Column, b: Column): Column =
    org.apache.spark.sql.graftx.Bridge.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.graftx.Bridge.expression(a),
        org.apache.spark.sql.graftx.Bridge.expression(b)))
}
