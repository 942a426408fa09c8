package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.PrefixSum

/** q220/q221: TRAINING-SHARD LAYOUT — the two deterministic
  * doc→compute-unit assignment problems every LM pipeline solves
  * after curation and before tokenizer/training jobs run, completing
  * the q78–q80/q113 sampling-and-sharding tier.
  *
  * q220 — CONTEXT-WINDOW PACKING audit. GPT-style training
  * concatenates a stream's documents and splits at fixed token
  * boundaries (B = 2048); a document is attributed to the window its
  * FIRST token lands in, and a document whose span crosses a boundary
  * is a "straddler" (its attention context is contaminated by a
  * split — THE statistic packing audits watch, alongside per-window
  * fill). Windows are packed per `source` stream in doc_id order —
  * the realistic sharded form: packing is sequential WITHIN a stream
  * by construction, so the stream is the parallelism unit (at 100 TB
  * you pack per (source, day-shard); a single global stream would be
  * one sequential scan — the exact WindowExec collapse q80 avoids
  * with [[PrefixSum]]). All integers — hash-exact oracle.
  *
  * q221 — SORTED SERPENTINE SHARD BALANCING. Balancing K training
  * shards by token count is makespan scheduling; true LPT greedy is
  * inherently sequential, but its standard parallel approximation —
  * sort by size desc, deal serpentine (block b left-to-right when b
  * is even, right-to-left when odd, so no shard always receives the
  * block's largest item) — is deterministic, one-pass, and
  * SQL-expressible. The global size rank rides
  * [[PrefixSum.orderedRunningSum]] (range-partition + per-partition
  * offsets — full parallelism, never a single global window task);
  * the oracle replays it with ROW_NUMBER. Output is shard-grain:
  * per-shard doc/token totals plus each shard's share of corpus
  * tokens (the imbalance readout; the spec pins the serpentine deal
  * and the balance bound on a planted skew fixture).
  */
object Packing {

  private val B = 2048L
  private val K = 8

  /** Window packing over (doc_id, source, text) at budget `b` —
    * factored so PackingSpec can pin a hand-computed stream (window
    * attribution, straddler flags, conservation).
    */
  def pack(docs: org.apache.spark.sql.DataFrame, b: Long): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("graft_tok"))
      .withColumn("graft_cum", sum(col("graft_tok")).over(w))
      .withColumn("window_id", expr(s"(graft_cum - graft_tok) div $b"))
      .withColumn("graft_straddle",
        (expr(s"(graft_cum - 1) div $b") =!= col("window_id")).cast("long"))
      .groupBy(col("source"), col("window_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("graft_tok")).cast("long").as("window_tokens"),
        sum(col("graft_straddle")).cast("long").as("n_straddlers"))
  }

  /** Serpentine deal over (doc_id, text) into `k` shards — factored
    * so PackingSpec can pin the deal order and the balance bound.
    */
  def deal(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("graft_tok"))
    val ranked = PrefixSum.orderedRunningSum(
      toks, orderBy = Seq(col("graft_tok").desc, col("doc_id")),
      value = lit(1L), outCol = "graft_rank", numPartitions = 8)
      .withColumn("graft_r", col("graft_rank") - 1)
    ranked.withColumn("shard_id",
      when(expr(s"(graft_r div $k) % 2") === 0, expr(s"graft_r % $k"))
        .otherwise(lit(k - 1) - expr(s"graft_r % $k")))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("graft_tok")).cast("long").as("total_tokens"))
  }

  val q220 = Q.of(
    "q220_sequence_packing",
    s"""WITH run AS (
      |  SELECT source, doc_id,
      |    len(regexp_split_to_array(trim(text), '\\s+')) AS tok,
      |    SUM(len(regexp_split_to_array(trim(text), '\\s+')))
      |      OVER (PARTITION BY source ORDER BY doc_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM documents
      |)
      |SELECT source, CAST((cum - tok) // $B AS BIGINT) AS window_id,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(tok) AS BIGINT) AS window_tokens,
      |  CAST(SUM(CASE WHEN (cum - 1) // $B <> (cum - tok) // $B
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
      |FROM run
      |GROUP BY 1, 2
      |ORDER BY source, window_id""".stripMargin) { t =>
    pack(t.documents, B).orderBy(col("source"), col("window_id"))
  }

  val q221 = Q.of(
    "q221_shard_balance",
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS tok
      |  FROM documents
      |), ranked AS (
      |  SELECT doc_id, tok,
      |    ROW_NUMBER() OVER (ORDER BY tok DESC, doc_id) - 1 AS r
      |  FROM toks
      |), dealt AS (
      |  SELECT doc_id, tok,
      |    CASE WHEN (r // $K) % 2 = 0 THEN r % $K
      |         ELSE $K - 1 - (r % $K) END AS shard_id
      |  FROM ranked
      |), cells AS (
      |  SELECT shard_id, COUNT(*) AS n_docs,
      |    CAST(SUM(tok) AS BIGINT) AS total_tokens
      |  FROM dealt GROUP BY 1
      |), tot AS (SELECT SUM(total_tokens) AS tt FROM cells)
      |SELECT CAST(shard_id AS BIGINT) AS shard_id, n_docs, total_tokens,
      |  CAST(total_tokens AS DOUBLE) / CAST(tt AS DOUBLE) AS token_share
      |FROM cells CROSS JOIN tot
      |ORDER BY shard_id""".stripMargin) { t =>
    val cells = deal(t.documents, K)
    val tot = cells.agg(sum(col("total_tokens")).as("graft_tt"))
    cells.join(broadcast(tot))
      .select(col("shard_id").cast("long").as("shard_id"),
        col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") / col("graft_tt").cast("double"))
          .as("token_share"))
      .orderBy(col("shard_id"))
  }

  def all: Seq[Q] = Seq(q220, q221)
}
