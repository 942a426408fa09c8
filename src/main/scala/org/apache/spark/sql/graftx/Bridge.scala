package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Column ⇄ Expression
  * converters — the supported way to lift a custom Catalyst
  * [[Expression]] (graft.functions.CosineSimilarity) into the public
  * Column API without a SparkSessionExtensions registration round-trip.
  * Lives under org.apache.spark.sql.* solely to satisfy the
  * `private[sql]` access scope; contains no Spark-internal logic.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
