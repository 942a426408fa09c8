package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.Bpe

/** q119: BPE subword tokenization (*rows-only*) — the REAL learned
  * form of q30's regex token proxy: merges are TRAINED on this
  * corpus's word-frequency dict (`operators/Bpe.learnFromCorpus` —
  * the published Sennrich algorithm, driver-held dict ≤ topV
  * entries), then every document is encoded by the zero-shuffle
  * native [[graft.functions.BpeTokenize]] loop and reported at
  * doc grain with its subword compression ratio — the token
  * accounting (cost models, shard budgets, context packing) every
  * LM pipeline runs ahead of training.
  *
  * No SQL engine can replay the training loop, so the query is
  * rows-only; BpeSpec covers it with an INDEPENDENT in-JVM encoder
  * (sequential merge application — a different algorithm than the
  * expression's min-rank-first loop; they agree by BPE's confluence
  * property, so a bug in either shows as disagreement), hand-computed
  * Sennrich-style training fixtures, and the open-vocabulary /
  * monotone-in-merges invariants.
  */
object Tokenize {

  val q119 = Q.rowsOnly("q119_bpe_tokenize") { t =>
    val merges = Bpe.learnFromCorpus(t.documents, "text", topV = 5000, nMerges = 200)
    t.documents
      .select(col("doc_id"), col("lang"), col("n_chars"),
        Bpe.tokenCount(col("text"), merges).as("n_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_tokens"), 4))
      .orderBy(col("doc_id"))
  }

  def all: Seq[Q] = Seq(q119)
}
