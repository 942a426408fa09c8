package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** The events `ts` column has shipped under two physical schemas
    * across driver testdata generations; normalize both to TIMESTAMP
    * (see [[Tables.normalizeTs]]). The conversion is a codegen'd
    * projection on top of the scan; pushdown/pruning on the other
    * columns is unaffected.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(t("events"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Normalize an events frame's `ts` to TIMESTAMP across the schema
    * variants the driver has generated:
    *  - TIMESTAMP(NANOS), which Spark's parquet reader rejects — read
    *    nanos as long under the legacy conf and truncate to micros,
    *    exactly what DuckDB's reader does;
    *  - TIMESTAMP_NTZ micros (round-7 testdata) — reinterpret the wall
    *    clock as a UTC instant via a session-tz cast (the session tz is
    *    pinned UTC in GraftSession/SparkSpec), which is byte-identical
    *    to how the DuckDB oracle reads the same file;
    *  - TIMESTAMP — already what queries expect.
    * Works on batch and streaming frames alike (pure projection).
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }
}
