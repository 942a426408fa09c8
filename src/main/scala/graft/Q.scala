package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan builder plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle. `oracle ==
  * None` marks a rows-only query (sketches, LSH, stubs) whose
  * correctness is covered by a ScalaTest spec instead.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def of(name: String, oracle: String)(f: Tables => DataFrame): Q =
    Q(name, (s, dir) => f(Tables(s, dir)), Some(oracle))

  def rowsOnly(name: String)(f: Tables => DataFrame): Q =
    Q(name, (s, dir) => f(Tables(s, dir)), None)
}
