package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-explicit JSONL / CSV ingest with corrupt-record quarantine —
  * the raw-text half of the io surface ([[PartitionedStore]] being the
  * columnar half). A training-data pipeline's upstream is rarely
  * parquet: crawl dumps and vendor drops arrive as JSON-lines or CSV,
  * at sizes where three Spark defaults become failure modes:
  *
  *  - Schema INFERENCE is a full extra pass over the data before the
  *    real scan — both readers here require an explicit schema, so one
  *    scan is the only scan.
  *  - FAILFAST kills a 100 TB job on the one malformed line somewhere
  *    in billions; DROPMALFORMED silently loses data with no ledger of
  *    how much. PERMISSIVE with a corrupt-record column keeps every
  *    line — parsed rows carry null in the quarantine column,
  *    unparsable lines carry their raw text — so bad input is an
  *    observable, re-processable dataset instead of an exception or a
  *    silent gap.
  *  - Filtering ONLY on the corrupt-record column of a json/csv scan
  *    is rejected by Spark's analyzer (the parser prunes other fields,
  *    so the filter would see nothing); [[split]] therefore
  *    materializes via [[graft.CacheScope.trackedCache]] before
  *    separating good rows from quarantined lines.
  *
  * Both readers are plain FileFormat scans: distributed, splittable
  * (JSONL and uncompressed CSV split on line boundaries), column-
  * pruned and filter-pushed like any other scan. Gzipped inputs
  * (`*.jsonl.gz` — the crawl-dump norm) decode transparently but gzip
  * is NOT splittable: parallelism collapses to one task per FILE, so
  * a 100 TB drop must arrive as many files (it does — crawl shards),
  * and a `repartition` after the read re-spreads any skewed shard
  * before expensive downstream stages. SourcesSpec pins the
  * round-trip, the quarantine ledger, and the gzip path on real
  * documents data.
  */
object TextIngest {

  val QuarantineCol = "graft_corrupt"

  private def withQuarantine(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(QuarantineCol),
      s"schema already defines $QuarantineCol")
    schema.add(QuarantineCol, StringType, nullable = true)
  }

  /** JSON-lines reader: explicit schema, one line = one record, corrupt
    * lines quarantined as raw text in [[QuarantineCol]].
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withQuarantine(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", QuarantineCol)
      .json(path)

  /** CSV reader: explicit schema, headerless by default (a header line
    * is just a corrupt record to a schema-explicit read — pass
    * `header = true` when the files carry one), corrupt lines
    * quarantined as raw text.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false): DataFrame =
    spark.read
      .schema(withQuarantine(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", QuarantineCol)
      .option("header", header.toString)
      .csv(path)

  /** Separates a quarantine-columned frame into (good rows without the
    * quarantine column, quarantined raw lines). Materializes the frame
    * first — Spark's analyzer (correctly) rejects a filter that
    * references only the corrupt-record column of a live json/csv
    * scan. Callers own the returned frames' lifecycle; the tracked
    * cache is released by the enclosing [[graft.CacheScope]].
    *
    * The cache makes this the INTERACTIVE-scale path: it materializes
    * the whole parsed frame (memory-and-disk) before either half is
    * usable. For an ingest bigger than the cluster wants to cache,
    * use [[splitToStore]] — one pass, no cache, the conformity flag
    * becomes a prunable partition column.
    */
  def split(parsed: DataFrame): (DataFrame, DataFrame) = {
    val mat = graft.CacheScope.trackedCache(parsed)
    val good = mat.filter(col(QuarantineCol).isNull).drop(QuarantineCol)
    val bad = mat.filter(col(QuarantineCol).isNotNull)
      .select(col(QuarantineCol).as("raw_line"))
    (good, bad)
  }

  /** One-pass scale variant of [[split]]: lands the parsed frame as
    * parquet partitioned by a conformity flag (plus any further
    * `partitionCols`), so good rows and the quarantine ledger are
    * separated by DIRECTORY — downstream reads of either side get
    * planning-time pruning ([[PartitionedStore]]), nothing is cached,
    * and the raw text is scanned exactly once.
    */
  def splitToStore(parsed: DataFrame, path: String,
      partitionCols: Seq[String] = Nil): Unit =
    PartitionedStore.writePartitioned(
      parsed.withColumn("graft_is_corrupt", col(QuarantineCol).isNotNull),
      path, "graft_is_corrupt" +: partitionCols)
}
