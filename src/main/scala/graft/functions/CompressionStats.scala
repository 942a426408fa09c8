package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** string → (n_bytes, n_deflate): the raw UTF-8 length and its
  * DEFLATE-compressed size — the compression-ratio quality signal of
  * the published web-corpus filter stacks (Gopher/MassiveText rules,
  * public: Rae et al. 2021): text that compresses TOO well is
  * templated/repetitive boilerplate, text that barely compresses is
  * encrypted/binary/random junk; natural prose sits in a band. This
  * is the whole-document twin of q116's shared-shingle detector (which
  * needs a corpus-wide exchange; this is per-row) and of q84's
  * line-level repetition gates.
  *
  * Why native: the signal needs the deflate loop itself — no
  * composition of built-ins expresses it, and a Scala UDF would break
  * WholeStageCodegen around the scan projection. Real `doGenCode` (a
  * static call into [[CompressionStatsImpl]]) keeps the scan stage
  * fused; the Deflater instance and scratch buffer are THREAD-LOCAL
  * (Deflater.reset() between rows), so the hot path allocates nothing
  * per row and never materializes the compressed bytes — it only
  * counts them.
  *
  * Determinism: Deflater level 6, default strategy, `nowrap = true`
  * (raw DEFLATE, no zlib header) — a pure function of the input bytes
  * for a given zlib, which is all a rows-only tier needs (the spec
  * pins band behavior, not exact byte counts).
  */
case class CompressionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CompressionStats.schema
  override def prettyName: String = "graft_compression_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_compression_stats expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CompressionStatsImpl.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressionStatsImpl.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): CompressionStats =
    copy(child = newChild)
}

object CompressionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_deflate", LongType, nullable = false)))

  def apply(c: Column): Column =
    org.apache.spark.sql.graftx.Bridge.column(
      CompressionStats(org.apache.spark.sql.graftx.Bridge.expression(c)))
}

/** The counting deflater, JVM-static so generated code can call it. */
object CompressionStatsImpl {

  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def stats(s: UTF8String): InternalRow = {
    val in = s.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = scratch.get()
    var out = 0L
    while (!d.finished()) {
      out += d.deflate(buf)
    }
    new GenericInternalRow(Array[Any](in.length.toLong, out))
  }
}
