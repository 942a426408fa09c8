package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (ref: Real-time Personalization
  * Effectiveness session blocks): a new session starts when the gap to
  * the previous event of the same key exceeds `gapSeconds`.
  *
  * Pattern: lag → boundary flag → running sum of flags = session
  * sequence number. One shuffle on the key; window state is O(1) per
  * row, so this holds at 100 TB as long as a single key's events fit
  * a task's sort spill budget (they stream — no materialization).
  */
object Sessionize {
  /** Adds `session_seq` (1-based long) per key. `tieBreak` must make
    * (ts, tieBreak) a total order within a key.
    */
  def byGap(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    val us = unix_micros(ts)
    val prevUs = lag(us, 1).over(w)
    val newSession = when(prevUs.isNull || (us - prevUs) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    df.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
  }
}
