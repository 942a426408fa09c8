package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.{Multimodal => M}

/** Multimodal pipeline query (SURVEY.md §2 q60): opaque binary payload
  * + typed metadata struct + stubbed decode (see
  * [[graft.operators.Multimodal]] — the decode is a clearly-marked
  * deterministic fake; the schema/plumbing is the real thing). The
  * whole pipeline is column expressions, so it has a real DuckDB
  * oracle despite the stub.
  */
object Multimodal {

  val q60 = Q.of(
    "q60_multimodal_meta",
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
      |  CAST(64 + (doc_id % 16) * 32 AS BIGINT) AS width,
      |  CAST(64 + (doc_id % 12) * 32 AS BIGINT) AS height,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS checksum,
      |  CAST(len(generate_series(1, greatest(octet_length(encode(text))-15, 1), 64)) AS BIGINT) AS n_frames,
      |  md5(substr(text, 1, 16)) AS first_frame
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { t =>
    // the Spark side strides payload BYTES; the oracle's substr is
    // char-based (DuckDB cannot slice BLOBs) — identical because the
    // corpus is ASCII (verified: octet_length(encode(text)) = length(text)
    // for every doc at every SF); the spec pins byte/char equivalence
    // structurally via the batched path on multibyte crafted docs
    M.decodeStub(M.withPayload(t.documents, "text", "doc_id"))
      .select(col("doc_id"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("n_bytes"), col("checksum"), col("n_frames"), col("first_frame"))
      .orderBy(col("doc_id"))
  }

  def all: Seq[Q] = Seq(q60)
}
