package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** (array<double>, array<struct<cid: long, cv: array<double>>>) → long:
  * id of the centroid with the highest cosine similarity to the vector
  * (ties broken toward the lowest id).
  *
  * This is the IVF cell-assignment argmax as a single per-row primitive
  * loop over a broadcast centroid array — the zero-shuffle replacement
  * for the crossJoin → ×|centroids| blow-up → row_number() window plan,
  * whose hash exchange of the amplified, vector-carrying frame was the
  * clearest 100×-scale killer flagged in round 2. With this expression
  * the assignment is pure map work: the centroid list rides in on a
  * one-row broadcast and every input partition computes its own argmax
  * in place.
  *
  * Like the sketch expressions, CodegenFallback is deliberate: eval is
  * a tight primitive loop (no boxing, no per-plane closure dispatch);
  * the win over the HOF form is allocation-free argmax, not codegen
  * fusion.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  // an empty centroid array yields null (no cell), even when both
  // inputs are non-null — see nullSafeEval
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _),
          ArrayType(StructType(Array(f0, f1)), _))
        if f0.dataType == LongType &&
          (f1.dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects (array<double>, array<struct<long, array<double>>>), " +
        s"got ${l.simpleString}, ${r.simpleString}")
  }

  override def nullSafeEval(v: Any, cents: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cs = cents.asInstanceOf[ArrayData]
    val nCents = cs.numElements()
    if (nCents == 0) return null // no cells to assign to (ADVICE r3)
    val dim = x.numElements()
    var nx = 0.0
    var i = 0
    while (i < dim) { val xi = x.getDouble(i); nx += xi * xi; i += 1 }
    var bestCos = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var c = 0
    while (c < nCents) {
      val row = cs.getStruct(c, 2)
      val cid = row.getLong(0)
      val cv = row.getArray(1)
      val n = math.min(dim, cv.numElements())
      var dotv = 0.0; var ny = 0.0
      var j = 0
      while (j < n) {
        val yj = cv.getDouble(j)
        dotv += x.getDouble(j) * yj; ny += yj * yj
        j += 1
      }
      // zero-norm vector or centroid: cosine undefined → rank it below
      // every real similarity (-1 ≤ cos always) instead of letting NaN
      // poison the comparison and fall through to Long.MaxValue
      val cos = if (nx == 0.0 || ny == 0.0) -2.0
        else dotv / (math.sqrt(nx) * math.sqrt(ny))
      if (cos > bestCos || (cos == bestCos && cid < bestCid)) {
        bestCos = cos; bestCid = cid
      }
      c += 1
    }
    bestCid
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  def apply(v: Column, centroids: Column): Column =
    org.apache.spark.sql.graftx.Bridge.column(
      NearestCentroid(
        org.apache.spark.sql.graftx.Bridge.expression(v),
        org.apache.spark.sql.graftx.Bridge.expression(centroids)))
}
