package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal => M}

/** The multimodal plumbing's two decode shapes must agree: the column
  * pipeline (decodeStub — what q60's oracle checks) and the
  * partition-batched iterator path (decodeBatchedStub — the
  * mapInPandas-shaped plumbing a real codec slots into).
  */
class MultimodalSpec extends SparkSpec {

  test("batched iterator decode ≡ column-pipeline decode on real docs") {
    val docs = M.withPayload(tables.documents, "text", "doc_id")
    val cols = M.decodeStub(docs)
      .select("doc_id", "n_bytes", "checksum", "n_frames", "first_frame")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toMap
    val batched = M.decodeBatchedStub(docs, "doc_id")
      .collect()
      .map(m => m.doc_id -> (m.n_bytes, m.checksum, m.n_frames, m.first_frame))
      .toMap
    assert(batched.size == cols.size)
    for ((id, c) <- cols)
      assert(batched(id) == c, s"doc $id: batched=${batched(id)} cols=$c")
  }

  test("batched ≡ columnar on MULTIBYTE docs (both stride payload bytes)") {
    import spark.implicits._
    val docs = M.withPayload(
      Seq((1L, "café 日本語テキスト — ünïcödé payload länger than sïxteen bytes ✓"),
        (2L, "日本語" * 40), (3L, "plain ascii control row"))
        .toDF("doc_id", "text"), "text", "doc_id")
    val cols = M.decodeStub(docs)
      .select("doc_id", "n_bytes", "checksum", "n_frames", "first_frame")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toMap
    val batched = M.decodeBatchedStub(docs, "doc_id").collect()
      .map(m => m.doc_id -> (m.n_bytes, m.checksum, m.n_frames, m.first_frame)).toMap
    assert(batched == cols, s"batched=$batched cols=$cols")
  }

  test("batched decode preserves partitioning (no shuffle)") {
    val docs = M.withPayload(tables.documents, "text", "doc_id")
    val df = M.decodeBatchedStub(docs, "doc_id").toDF()
    assert(shuffles(df).isEmpty,
      "per-partition decode must not plan an exchange")
  }
}
