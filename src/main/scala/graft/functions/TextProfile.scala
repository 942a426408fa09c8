package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** string → struct of the seven text-analysis counts the corpus
  * pipeline needs (q30/q31/q32/q38) — n_ws_tokens, n_bpe_tokens,
  * n_punct, en/de/es/fr_hits — computed in ONE pass over the
  * string's bytes:
  *
  *   - `n_ws_tokens`  — matches of `\S+` (maximal non-whitespace runs)
  *   - `n_bpe_tokens` — matches of `[a-z]+|[0-9]+|[^a-z0-9\s]`
  *   - `n_punct`      — matches of `[^a-z0-9 ]` (per character)
  *   - `en/de/es/fr_hits` — matches of `\b(stop|words|…)\b` per language
  *
  * Semantics are the regex counts the composed form produced (TextSpec
  * pins fused ≡ regex on hostile AND fixed-seed random inputs): `\s`
  * is ASCII `[ \t\n\x0B\f\r]`, and the stopword boundary is the ASCII
  * `\w = [A-Za-z0-9_]` boundary, so a stopword hit is precisely a
  * maximal ASCII-word-char run equal to the (lowercase) stopword.
  * Multi-byte characters count as single non-ws/non-word characters
  * (UTF-8 continuation bytes are skipped). NOTE: this is the
  * DuckDB/RE2 `\b` (the oracle's semantics); Java's `\b` is
  * Unicode-aware, so it disagrees exactly when a stopword abuts a
  * multibyte letter (`日der` has a Java boundary nowhere, an ASCII
  * boundary before the `d`) — the TextSpec random sweep mirrors the
  * ASCII boundary with explicit lookarounds for that reason.
  *
  * Why native: the composed form ran eight `regexp_extract_all` calls
  * per row, each allocating an array of every match just to take its
  * size — and Catalyst's filter pushdown duplicates those alias
  * expressions into gate predicates (q38 evaluated ~20 regex scans per
  * row). This expression is allocation-free, and unlike the sketch
  * expressions it has real `doGenCode` (a static call into
  * [[TextProfileImpl]]), so the scan stage keeps WholeStageCodegen and
  * duplicated references collapse under codegen subexpression
  * elimination.
  *
  * Ref: the reference computes these per-row text stats with Python
  * UDF-ish column stacks (e.g. /root/reference/pyspark/Content
  * Affinity and Cross-Genre Analysis.py genre string splits); this is
  * the 100 TB-ready form of the same per-row pass.
  */
case class TextProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextProfile.schema
  override def prettyName: String = "graft_text_profile"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_text_profile expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextProfileImpl.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextProfileImpl.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
}

object TextProfile {
  val schema: StructType = StructType(Seq(
    StructField("n_ws_tokens", LongType, nullable = false),
    StructField("n_bpe_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("en_hits", LongType, nullable = false),
    StructField("de_hits", LongType, nullable = false),
    StructField("es_hits", LongType, nullable = false),
    StructField("fr_hits", LongType, nullable = false)))

  def apply(c: Column): Column =
    org.apache.spark.sql.graftx.Bridge.column(
      TextProfile(org.apache.spark.sql.graftx.Bridge.expression(c)))
}

/** The one-pass walker, JVM-static so generated code can call it. */
object TextProfileImpl {

  private val EN = Array("the", "a", "and", "of", "to", "in", "is")
  private val DE = Array("der", "die", "das", "und", "ist", "nicht", "ein")
  private val ES = Array("el", "los", "las", "una", "es", "y", "que")
  private val FR = Array("le", "les", "des", "et", "est", "une", "dans")
  // stopword bytes, grouped as [lang][word][byte] for allocation-free compare
  private val WORDS: Array[Array[Array[Byte]]] =
    Array(EN, DE, ES, FR).map(_.map(_.getBytes("US-ASCII")))
  private val MAX_WORD = 5 // "nicht"

  private def hits(buf: Array[Byte], n: Int, lang: Int): Int = {
    val ws = WORDS(lang)
    var w = 0
    while (w < ws.length) {
      val cand = ws(w)
      if (cand.length == n) {
        var i = 0
        var ok = true
        while (ok && i < n) { if (buf(i) != cand(i)) ok = false; i += 1 }
        if (ok) return 1
      }
      w += 1
    }
    0
  }

  def profile(s: UTF8String): InternalRow = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    var nWs = 0L; var nBpe = 0L; var nPunct = 0L
    var en = 0L; var de = 0L; var es = 0L; var fr = 0L
    var inNonWs = false
    var bpeClass = 0 // 0 = none/ws, 1 = [a-z] run, 2 = [0-9] run, 3 = other
    val wbuf = new Array[Byte](MAX_WORD)
    var wlen = 0
    var wvalid = true
    var i = 0
    while (i < len) {
      val b = Platform.getByte(base, off + i)
      if ((b & 0xC0) == 0x80) {
        // UTF-8 continuation byte: interior of a multi-byte char already
        // counted at its lead byte; stays inside the current \S run.
        inNonWs = true
      } else {
        val isAscii = (b & 0x80) == 0
        val lower = isAscii && b >= 'a' && b <= 'z'
        val digit = isAscii && b >= '0' && b <= '9'
        val upper = isAscii && b >= 'A' && b <= 'Z'
        val isWs = isAscii && (b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r')
        // \S+ runs
        if (isWs) inNonWs = false
        else { if (!inNonWs) nWs += 1; inNonWs = true }
        // [^a-z0-9 ] per char (note: only space excluded — tabs/newlines count)
        if (!(lower || digit || (isAscii && b == ' '))) nPunct += 1
        // [a-z]+|[0-9]+|[^a-z0-9\s]
        if (isWs) bpeClass = 0
        else if (lower) { if (bpeClass != 1) nBpe += 1; bpeClass = 1 }
        else if (digit) { if (bpeClass != 2) nBpe += 1; bpeClass = 2 }
        else { nBpe += 1; bpeClass = 3 }
        // \b word runs over \w = [A-Za-z0-9_]
        if (lower || digit || upper || (isAscii && b == '_')) {
          if (lower && wvalid && wlen < MAX_WORD) { wbuf(wlen) = b; wlen += 1 }
          else { wvalid = false; wlen = MAX_WORD + 1 }
        } else if (wlen > 0) {
          if (wvalid) {
            en += hits(wbuf, wlen, 0); de += hits(wbuf, wlen, 1)
            es += hits(wbuf, wlen, 2); fr += hits(wbuf, wlen, 3)
          }
          wlen = 0; wvalid = true
        }
      }
      i += 1
    }
    if (wlen > 0 && wvalid) {
      en += hits(wbuf, wlen, 0); de += hits(wbuf, wlen, 1)
      es += hits(wbuf, wlen, 2); fr += hits(wbuf, wlen, 3)
    }
    new GenericInternalRow(Array[Any](nWs, nBpe, nPunct, en, de, es, fr))
  }
}
