package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group via a partitioned ranking window.
  *
  * Scale notes (SURVEY.md §5): the window is always partitioned, so
  * state per task is one group at a time; Spark plans this as a single
  * hash-shuffle on the partition keys followed by a streaming rank —
  * no global sort. Order columns must form a total order within the
  * partition or the result is nondeterministic.
  */
object TopK {
  def perGroup(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
      k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }
}
