package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.Bpe

/** q119: BPE subword tokenization — the REAL learned form of q30's
  * regex token proxy: merges are TRAINED on this corpus's
  * word-frequency dict (`operators/Bpe.learnFromCorpus` — the
  * published Sennrich algorithm, driver-held dict ≤ topV entries),
  * then every document is encoded by the zero-shuffle native
  * [[graft.functions.BpeTokenize]] loop and reported at doc grain
  * with its subword compression ratio — the token accounting (cost
  * models, shard budgets, context packing) every LM pipeline runs
  * ahead of training.
  *
  * ORACLE (round 11 — formerly rows-only): the TRAINING loop is not
  * SQL-replayable, but encoding under a fixed merge table is, so the
  * builder materializes the learned table to parquet and the DuckDB
  * oracle replays the deterministic encode fold over it
  * ([[Bpe.oracleEncodeCtes]] — rank-ordered left-to-right rewrites,
  * ≡ the min-rank-first loop on trained tables). BpeSpec additionally
  * covers training with an INDEPENDENT in-JVM encoder and
  * hand-computed Sennrich fixtures.
  */
object Tokenize {

  /** Fixed handshake path: the oracle SQL is a static string, so the
    * merge table lands at a corpus-independent location, overwritten
    * per run (Verify runs one sf at a time; content is deterministic
    * in the corpus).
    */
  private val MergesDir = "/tmp/graft_q119_merges"

  val q119 = Q.of(
    "q119_bpe_tokenize",
    s"""WITH ${Bpe.oracleEncodeCtes(MergesDir)}
      |SELECT d.doc_id, d.lang, d.n_chars,
      |  COALESCE(dt.t, 0) AS n_tokens,
      |  round(CAST(d.n_chars AS DOUBLE)
      |    / CAST(COALESCE(dt.t, 0) AS DOUBLE), 4) AS chars_per_token
      |FROM documents d LEFT JOIN dtok dt ON d.doc_id = dt.doc_id
      |ORDER BY d.doc_id""".stripMargin) { t =>
    val merges = Bpe.learnFromCorpus(t.documents, "text", topV = 5000, nMerges = 200)
    Bpe.materialize(t.documents, merges, MergesDir)
    t.documents
      .select(col("doc_id"), col("lang"), col("n_chars"),
        Bpe.tokenCount(col("text"), merges).as("n_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_tokens").cast("double"), 4))
      .orderBy(col("doc_id"))
  }

  def all: Seq[Q] = Seq(q119)
}
