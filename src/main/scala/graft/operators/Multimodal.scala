package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal payload plumbing (SURVEY.md §2 q60).
  *
  * Models the Spark-side shape of an image/audio pipeline: an opaque
  * `binary` payload column + a typed metadata struct, with
  * decode/feature steps as column pipelines downstream of the payload.
  * The real decoders (image/audio codecs) are NOT available in this
  * environment — `decodeStub` is a clearly-marked deterministic fake
  * (strided hash "frames" standing in for sampled decoded frames). The
  * plumbing that matters at scale IS real: payloads stay opaque bytes
  * end-to-end, metadata travels as a struct column, per-row cost is
  * O(payload bytes), and nothing shuffles until an explicit aggregate.
  *
  * On a real cluster the stub body is replaced by an `mapInPandas` /
  * JNI decode over the same (payload, meta) schema — the surrounding
  * plan is unchanged.
  */
object Multimodal {

  /** Wraps a text column as an opaque binary payload with a typed
    * metadata struct (format/width/height derived deterministically
    * from the row id — the testdata has no real media bytes).
    */
  def withPayload(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("meta", struct(
        element_at(array(lit("jpeg"), lit("png"), lit("webp")), (pmod(col(idCol), lit(3)) + 1).cast("int")).as("format"),
        (lit(64) + pmod(col(idCol), lit(16)) * 32).cast("long").as("width"),
        (lit(64) + pmod(col(idCol), lit(12)) * 32).cast("long").as("height")))

  /** STUB decode/feature-extract: deterministic fake in place of a real
    * codec. "Frame samples" are md5 digests of strided 16-char windows
    * of the payload text (stride 64 ≈ frame sampling); `checksum` is
    * the md5 of the raw payload bytes. Schema and batch shape match
    * what a real decoder UDF would produce.
    */
  def decodeStub(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(textCol)).cast("long"))
      .withColumn("checksum", md5(col("payload")))
      .withColumn("frames", expr(
        s"transform(sequence(1, greatest(length($textCol)-15, 1), 64)," +
          s" i -> md5(substr($textCol, i, 16)))"))
      .withColumn("n_frames", size(col("frames")).cast("long"))
      .withColumn("first_frame", element_at(col("frames"), 1))
}
