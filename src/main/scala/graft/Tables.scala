package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Typed loaders for the driver-generated testdata star schema
  * (TESTDATA.md). Plain parquet scans — Catalyst pushes filters and
  * prunes columns into these, so callers should NOT cache or
  * materialize here.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Read nanos as long (legacy conf) and truncate to
    * microseconds — exactly what DuckDB's reader does, so the oracle
    * sees identical instants. The conversion is a codegen'd projection
    * on top of the scan; pushdown/pruning on the other columns is
    * unaffected.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
