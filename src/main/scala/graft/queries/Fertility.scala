package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.Bpe

/** q213: TOKENIZER FERTILITY per language (*rows-only*) — the
  * standard multilingual-tokenizer audit (fertility = subword tokens
  * per whitespace word; bytes-per-token; both from the multilingual
  * LM literature, public): a tokenizer trained on a mixed corpus
  * over-fragments under-represented languages, which inflates their
  * effective sequence lengths and training cost — THE number a
  * data-mixture owner checks before fixing a vocab. q119 tokenizes
  * at doc grain; this rolls the same learned-BPE encoding up to the
  * per-language readout, plus each language's share of corpus tokens
  * vs its share of documents (the mixture-distortion signal).
  *
  * ORACLE (round 11 — formerly rows-only): q119's recipe — the
  * builder materializes the trained merge table and the DuckDB oracle
  * replays the encode fold ([[Bpe.oracleEncodeCtes]]), then rolls the
  * identical integer cells up per language. All emitted ratios are
  * single IEEE divisions of exact integer sums; FertilitySpec pins
  * the ≥ 1 fertility floor (a word is at least one token), the
  * monotone-in-merges improvement, and a hand-tokenized fixture.
  *
  * Scale shape: merges are a driver-held ≤200-entry dict broadcast
  * into the zero-shuffle native encode loop; ONE documents scan
  * folds to |langs| cells (map-side combined). Output ≤ |langs| rows.
  */
object Fertility {

  /** Own handshake dir (content identical to q119's — training is
    * deterministic — but separate paths keep the two queries'
    * write/read lifecycles independent).
    */
  private val MergesDir = "/tmp/graft_q213_merges"

  val q213 = Q.of(
    "q213_tokenizer_fertility",
    s"""WITH ${Bpe.oracleEncodeCtes(MergesDir)},
      |per AS (
      |  SELECT d.lang, d.n_chars,
      |    CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS w,
      |    COALESCE(dt.t, 0) AS t
      |  FROM documents d LEFT JOIN dtok dt ON d.doc_id = dt.doc_id
      |), cells AS (
      |  SELECT lang, COUNT(*) AS n_docs, SUM(w) AS n_words,
      |    SUM(t) AS n_tokens, SUM(n_chars) AS n_chars
      |  FROM per GROUP BY 1
      |), tot AS (
      |  SELECT SUM(n_docs) AS td, SUM(n_tokens) AS tt FROM cells
      |)
      |SELECT lang,
      |  CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_words AS BIGINT) AS n_words,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility,
      |  CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS chars_per_token,
      |  CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE) AS token_share,
      |  CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE) AS doc_share
      |FROM cells CROSS JOIN tot
      |ORDER BY lang""".stripMargin) { t =>
    val merges = Bpe.learnFromCorpus(t.documents, "text", topV = 5000, nMerges = 200)
    Bpe.materialize(t.documents, merges, MergesDir)
    val perDoc = t.documents
      .select(col("lang"), col("n_chars"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("graft_w"),
        Bpe.tokenCount(col("text"), merges).as("graft_t"))
    val cells = perDoc
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("graft_w")).as("n_words"),
        sum(col("graft_t")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
    val totals = cells.agg(
      sum(col("n_docs")).as("graft_td"),
      sum(col("n_tokens")).as("graft_tt"))
    cells
      .join(broadcast(totals))
      .select(
        col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"),
        (col("n_tokens").cast("double") / col("graft_tt").cast("double"))
          .as("token_share"),
        (col("n_docs").cast("double") / col("graft_td").cast("double"))
          .as("doc_share"))
      .orderBy(col("lang"))
  }

  def all: Seq[Q] = Seq(q213)
}
