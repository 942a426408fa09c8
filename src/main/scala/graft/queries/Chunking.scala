package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q126: TRAINING-SEQUENCE CHUNKING — the context-window slicer every
  * LM data pipeline runs between curation and tokenizer sharding:
  * each document's token stream is cut into fixed-length windows
  * (`chunk` tokens) advancing by a fixed `stride`, so long documents
  * yield overlapping training sequences (stride < chunk ⇒ each
  * boundary is seen inside some window — the standard long-document
  * recipe) and short documents yield exactly one. Emitted row-per-
  * chunk with an md5 content hash — the grain a packing/sharding
  * stage (q80) or a chunk-level dedup (q112) consumes next.
  *
  * Scale shape: ZERO shuffles before the presentation sort — chunk
  * starts are a `sequence(0, size-1, stride)` explode and each chunk
  * a `slice` + hash projection, all inside the one scan's codegen
  * stage; output size is Σ tokens/stride rows, linear in corpus
  * tokens with no per-group state at all (contrast q109's class of
  * per-group arrays — here the "group" never exists). On a cluster
  * the chunk rows inherit the scan's partitioning; nothing moves.
  *
  * The oracle replays with DuckDB `range`/`list_slice` — both engines
  * truncate the trailing window at the document end, and md5 pins the
  * exact token content of every chunk, not just its length.
  */
object Chunking {

  private val Chunk  = 32
  private val Stride = 16

  /** Row-per-chunk slicer, factored so the spec can pin boundary
    * cases (doc shorter than one chunk, exact-multiple lengths, the
    * trailing partial window).
    */
  def chunks(docs: DataFrame, chunk: Int, stride: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        explode(expr(s"sequence(0, size(w) - 1, $stride)")).as("start"))
      .select(col("doc_id"),
        expr(s"CAST(start div $stride AS BIGINT)").as("chunk_idx"),
        expr(s"slice(w, start + 1, $chunk)").as("c"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("c")).cast("long").as("n_tokens"),
        expr("md5(concat_ws(' ', c))").as("chunk_md5"))

  val q126 = Q.of(
    "q126_token_chunks",
    s"""WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), s AS (
      |  SELECT doc_id, w, unnest(range(0, len(w), $Stride)) AS start FROM d
      |)
      |SELECT doc_id,
      |  CAST(start // $Stride AS BIGINT) AS chunk_idx,
      |  CAST(len(list_slice(w, start + 1, start + $Chunk)) AS BIGINT) AS n_tokens,
      |  md5(array_to_string(list_slice(w, start + 1, start + $Chunk), ' ')) AS chunk_md5
      |FROM s
      |ORDER BY doc_id, chunk_idx""".stripMargin) { t =>
    chunks(t.documents, Chunk, Stride).orderBy(col("doc_id"), col("chunk_idx"))
  }

  def all: Seq[Q] = Seq(q126)
}
