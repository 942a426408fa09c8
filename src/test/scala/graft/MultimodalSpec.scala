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

  test("resizeFramesBatched: byte decimation, recomputed dims, frame cap — no shuffle") {
    import spark.implicits._
    val big = "0123456789abcdef" * 200 // 3200 bytes -> 1600 resized -> >8 frame slots
    val docs = M.withPayload(
      Seq((0L, big), (1L, "short"), (2L, "日本語" * 40))
        .toDF("doc_id", "text"), "text", "doc_id")
    val out = M.resizeFramesBatched(docs, "doc_id",
        factor = 2, frameStride = 64, maxFrames = 8)
      .collect().map(m => m.doc_id -> m).toMap
    // independent ground truth: decimate the UTF-8 bytes in the test
    for ((id, text) <- Seq(0L -> big, 1L -> "short", 2L -> "日本語" * 40)) {
      val bytes = text.getBytes("UTF-8")
      val resized = bytes.indices.collect { case j if j % 2 == 0 => bytes(j) }.toArray
      val expectChecksum = java.security.MessageDigest.getInstance("MD5")
        .digest(resized).map(b => f"${b & 0xff}%02x").mkString
      assert(out(id).n_bytes_in == bytes.length, s"doc $id bytes_in")
      assert(out(id).n_bytes_out == (bytes.length + 1) / 2, s"doc $id bytes_out")
      assert(out(id).checksum == expectChecksum, s"doc $id checksum (byte semantics)")
    }
    assert(out(0L).n_frames == 8, "frame budget not enforced")
    assert(out(1L).n_frames == 1)
    // resized dims: width = 64 + (id%16)*32 halved, floor at 1
    assert(out(1L).out_width == (64 + 1 * 32) / 2)
    // and the stage plans no exchange
    val df = M.resizeFramesBatched(docs, "doc_id", 2, 64, 8).toDF()
    assert(shuffles(df).isEmpty, "per-partition resize must not plan an exchange")
  }
}
