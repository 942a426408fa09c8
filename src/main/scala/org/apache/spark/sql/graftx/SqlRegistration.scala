package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** `private[sql]` accessor for the session FunctionRegistry — the
  * hook that makes graft's native Catalyst expressions callable from
  * `spark.sql("...")` text (graft.SqlFunctions holds the catalog).
  * Like [[Bridge]], this lives under org.apache.spark.sql.* solely
  * for the access scope and contains no Spark-internal logic.
  */
object SqlRegistration {
  def register(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "internal")
}
