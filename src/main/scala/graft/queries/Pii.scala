package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** q87: PII detection + redaction — the scrubbing pass a compliant
  * training pipeline runs before anything else: find structured PII
  * (emails, long ID-like digit runs), replace it with stable
  * placeholder tokens, and report per-doc detection counts so the
  * pipeline can route PII-dense documents to quarantine.
  *
  * The synthetic corpus carries no PII, so both engines append the
  * same deterministic contact line (`userN@mailM.com`, a 7+-digit
  * reference number, both closed-form in `doc_id`) before scrubbing —
  * the oracle then checks the DETECTOR and REDACTOR, not the
  * fixture: per-doc email/number counts, the redacted length, and the
  * md5 of the full redacted text (a single hash pinning every byte of
  * the rewrite, so a one-character regex divergence between Java
  * regex and RE2 would flip the row).
  *
  * Pattern discipline (§6 oracle contract): ASCII classes + bounded
  * quantifiers only — `[a-z0-9]+@[a-z0-9]+\.[a-z]+` and `[0-9]{7,}`
  * have identical semantics in Java regex (Spark codegen'd
  * `regexp_replace`) and RE2 (DuckDB, `'g'` flag for global). Numbers
  * are counted AFTER email redaction on both sides so an address's
  * local part can't double-count.
  *
  * Scale shape: pure per-row projection over the scan — zero shuffle
  * until the presentation sort; the regex state machines are
  * per-row, no allocation beyond the rewrite buffer.
  */
object Pii {

  private val EmailPat = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  private val NumPat = "[0-9]{7,}"

  val q87 = Q.of(
    "q87_pii_redact",
    """SELECT doc_id, n_emails,
      |  len(regexp_extract_all(deemailed, '[0-9]{7,}')) AS n_longnums,
      |  length(regexp_replace(deemailed, '[0-9]{7,}', '<NUM>', 'g')) AS n_chars_redacted,
      |  md5(regexp_replace(deemailed, '[0-9]{7,}', '<NUM>', 'g')) AS redacted_md5
      |FROM (
      |  SELECT doc_id,
      |    len(regexp_extract_all(t2, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS n_emails,
      |    regexp_replace(t2, '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g') AS deemailed
      |  FROM (
      |    SELECT doc_id,
      |      text || ' contact user' || CAST(doc_id AS VARCHAR)
      |           || '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.com ref '
      |           || CAST(1000000 + doc_id * 7919 AS VARCHAR) AS t2
      |    FROM documents
      |  )
      |)
      |ORDER BY doc_id""".stripMargin) { t =>
    redactionReport(withSyntheticPii(t.documents).select("doc_id", "t2"))
      .orderBy(col("doc_id"))
  }

  /** APPENDS `t2` = text + the deterministic contact line (email +
    * 7+-digit ref, closed-form in doc_id) — the shared fixture for
    * q87 and the q90 streaming curation pass; the oracle re-derives
    * the identical column in SQL. Stateless projection.
    */
  def withSyntheticPii(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.withColumn("t2",
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail"), (col("doc_id") % 10).cast("string"), lit(".com ref "),
        (lit(1000000L) + col("doc_id") * 7919L).cast("string")))

  /** The t2 fixture as oracle SQL (kept textually next to the Spark
    * form above so the two can't drift).
    */
  private[queries] val SyntheticPiiSql: String =
    "text || ' contact user' || CAST(doc_id AS VARCHAR)" +
      " || '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.com ref '" +
      " || CAST(1000000 + doc_id * 7919 AS VARCHAR)"

  /** The q87 detector/redactor over any (doc_id, t2) frame — factored
    * so CurationSpec can drive it with crafted PII strings. Pure
    * per-row projection.
    */
  def redactionReport(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    docs
      .select(col("doc_id"),
        size(regexp_extract_all(col("t2"), lit(EmailPat), lit(0))).cast("long").as("n_emails"),
        regexp_replace(col("t2"), EmailPat, "<EMAIL>").as("deemailed"))
      .select(col("doc_id"), col("n_emails"),
        size(regexp_extract_all(col("deemailed"), lit(NumPat), lit(0))).cast("long").as("n_longnums"),
        length(regexp_replace(col("deemailed"), NumPat, "<NUM>")).cast("long").as("n_chars_redacted"),
        md5(regexp_replace(col("deemailed"), NumPat, "<NUM>")).as("redacted_md5"))
  }

  /** Redacted TEXT (not just the report) — the pipeline consumer shape. */
  def redactText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(text, EmailPat, "<EMAIL>"), NumPat, "<NUM>")

  def all: Seq[Q] = Seq(q87)
}
