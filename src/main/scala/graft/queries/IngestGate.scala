package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q268: DELTA-INGEST ADMISSION gate — the composed per-batch decision
  * the incremental tier's pieces exist for, as ONE oracle-checked
  * plan: the DELTA batch (`doc_id % 5 = 0`, the q112/q259/q261 grain)
  * is admitted or rejected with a named verdict, in precedence order:
  * `dup_base` (canonical key already in the standing corpus — the
  * q265 grain, so a re-cased/re-punctuated copy still rejects),
  * `dup_delta` (a canonical twin earlier IN the same batch; the
  * min-doc_id member survives to the next gate), `quality` (the q84
  * floor: < 20 tokens or < 100 chars), else `admitted`. Per
  * (source, verdict): doc count + character mass — the daily
  * admission report a curation pipeline actually publishes, and the
  * batch-side twin of q121/q250's full-corpus composition.
  *
  * Determinism: md5 canonical keys, integer counts/masses, CASE
  * precedence identical in both engines — zero floats.
  *
  * Scale shape: base touches ONE distinct-key projection (md5 keys
  * ride the exchange, never text); the delta is |batch|-sized
  * throughout — dup_base is a left-semi key join, dup_delta one
  * min-per-key groupBy on batch keys, quality a projection. Output
  * ≤ |sources|·4 rows. Nothing corpus-sized shuffles.
  */
object IngestGate {

  private val MinTokens = 20
  private val MinChars = 100

  val q268 = Q.of(
    "q268_ingest_gate",
    s"""WITH keyed AS (
      |  SELECT doc_id, source, n_chars,
      |    len(string_split(text, ' ')) AS n_tok,
      |    ${NormalizedDedup.CanonDuck} AS ck
      |  FROM documents
      |), delta AS (
      |  SELECT * FROM keyed WHERE doc_id % 5 = 0
      |), base_keys AS (
      |  SELECT DISTINCT ck FROM keyed WHERE doc_id % 5 <> 0
      |), dmin AS (
      |  SELECT ck, MIN(doc_id) AS first_doc FROM delta GROUP BY ck
      |), verdicts AS (
      |  SELECT d.source, d.n_chars,
      |    CASE
      |      WHEN b.ck IS NOT NULL THEN 'dup_base'
      |      WHEN d.doc_id <> m.first_doc THEN 'dup_delta'
      |      WHEN d.n_tok < $MinTokens OR d.n_chars < $MinChars THEN 'quality'
      |      ELSE 'admitted'
      |    END AS verdict
      |  FROM delta d
      |  LEFT JOIN base_keys b ON b.ck = d.ck
      |  JOIN dmin m ON m.ck = d.ck
      |)
      |SELECT source, verdict,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS char_mass
      |FROM verdicts GROUP BY source, verdict
      |ORDER BY source, verdict""".stripMargin) { t =>
    report(t.documents)
  }

  /** The admission report over a (doc_id, source, n_chars, text)
    * frame. Factored so the spec can plant one doc per verdict and
    * pin the precedence order.
    */
  def report(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("source"), col("n_chars"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      expr(NormalizedDedup.CanonSql).as("ck"))
    val delta = keyed.filter(col("doc_id") % 5 === 0)
    val baseKeys = keyed.filter(col("doc_id") % 5 =!= 0)
      .select(col("ck")).distinct()
      .withColumn("graft_in_base", lit(true))
    val dmin = delta.groupBy(col("ck"))
      .agg(min(col("doc_id")).as("graft_first_doc"))
    val verdicts = delta
      .join(baseKeys, Seq("ck"), "left_outer")
      .join(dmin, Seq("ck"))
      .select(col("source"), col("n_chars"),
        when(col("graft_in_base").isNotNull, "dup_base")
          .when(col("doc_id") =!= col("graft_first_doc"), "dup_delta")
          .when(col("n_tok") < MinTokens || col("n_chars") < MinChars,
            "quality")
          .otherwise("admitted").as("verdict"))
    verdicts.groupBy(col("source"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("char_mass"))
      .orderBy(col("source"), col("verdict"))
  }

  def all: Seq[Q] = Seq(q268)
}
