package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** One decoded row of media features — the schema a real decoder
  * batch returns (mirrors the decodeStub column pipeline).
  */
final case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: String,
    n_frames: Long, first_frame: String)

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
    * codec. "Frame samples" are md5 digests of strided 16-BYTE windows
    * of the raw payload (stride 64 ≈ frame sampling); `checksum` is
    * the md5 of the raw payload bytes. Everything is derived from the
    * payload BYTES — the same bytes [[decodeBatchedStub]] strides — so
    * the two decode shapes are equivalent by construction for any
    * input (ADVICE r3: the old char-strided form only agreed with the
    * byte-strided batch path on single-byte text). Schema and batch
    * shape match what a real decoder UDF would produce.
    */
  def decodeStub(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("checksum", md5(col("payload")))
      .withColumn("frames", expr(
        "transform(sequence(1, greatest(octet_length(payload)-15, 1), 64)," +
          " i -> md5(substring(payload, i, 16)))"))
      .withColumn("n_frames", size(col("frames")).cast("long"))
      .withColumn("first_frame", element_at(col("frames"), 1))

  implicit val mediaEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** BATCH-shaped decode over raw payload bytes: the Scala analog of a
    * `mapInPandas` decoder — invoked once per PARTITION with an
    * iterator over (id, payload) rows, so per-batch setup (a codec
    * context, a model handle; here the reused MessageDigest) is paid
    * once per task, not per row, and rows stream through without
    * materializing the partition. Preserves the input partitioning —
    * no shuffle. Same stub semantics as [[decodeStub]] (byte-strided
    * fake frames; swap the loop body for a real codec on a cluster
    * that has one) — MultimodalSpec pins batched ≡ column-pipeline.
    */
  def decodeBatchedStub(df: DataFrame, idCol: String): Dataset[MediaFeatures] = {
    val slim = df.select(col(idCol).cast("long"), col("payload"))
    import slim.sparkSession.implicits._
    slim.as[(Long, Array[Byte])].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]): String = {
        val digest = md.digest(b)
        val sb = new StringBuilder(32)
        for (x <- digest) sb.append(f"${x & 0xff}%02x")
        sb.toString
      }
      it.map { case (id, payload) =>
        val len = payload.length
        val limit = math.max(len - 15, 1)
        var i = 1
        var n = 0L
        var first: String = null
        while (i <= limit) {
          val frame = hex(java.util.Arrays.copyOfRange(payload, i - 1, math.min(i + 15, len)))
          if (first == null) first = frame
          n += 1
          i += 64
        }
        MediaFeatures(id, len.toLong, hex(payload), n, first)
      }
    }
  }
}
