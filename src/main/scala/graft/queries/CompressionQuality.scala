package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.CompressionStats

/** q132: COMPRESSION-RATIO quality gate (*rows-only*) — the
  * Gopher/MassiveText-class per-document filter (Rae et al. 2021,
  * public): deflate the text and band on raw/compressed size.
  * Near-incompressible documents are binary/encrypted/random junk;
  * over-compressible ones are templated boilerplate; natural prose
  * sits between. Complements q116 (corpus-wide shared shingles,
  * needs an exchange) with a ZERO-SHUFFLE per-row signal, and q84's
  * line-level repetition gates with a whole-document one.
  *
  * Scale shape: the [[CompressionStats]] native expression rides the
  * scan's WholeStageCodegen (thread-local deflater, nothing
  * allocated or materialized per row — compressed bytes are counted,
  * never stored), then one bounded (lang, verdict) rollup. No SQL
  * engine can replay deflate ⇒ rows-only; CorpusOpsSpec pins the
  * band behavior on crafted inputs (templated ≫ natural ≫
  * random-hex ratios), the ladder cutpoints, and the codegen'd
  * single-scan plan.
  */
object CompressionQuality {

  private val LoRatio = 1.5  // below: incompressible junk
  private val HiRatio = 8.0  // above: templated boilerplate

  /** Per-doc compression ratio + verdict, factored for the spec. */
  def withVerdict(docs: DataFrame): DataFrame =
    docs
      .withColumn("cs", CompressionStats(col("text")))
      .withColumn("ratio",
        round(col("cs.n_bytes").cast("double") /
          greatest(col("cs.n_deflate"), lit(1L)).cast("double"), 4))
      .withColumn("verdict",
        when(col("ratio") < LoRatio, lit("incompressible"))
          .when(col("ratio") > HiRatio, lit("templated"))
          .otherwise(lit("natural")))
      .drop("cs")

  val q132 = Q.rowsOnly("q132_compression_quality") { t =>
    withVerdict(t.documents)
      .groupBy(col("lang"), col("verdict"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("ratio")), 4).as("avg_ratio"))
      .orderBy(col("lang"), col("verdict"))
  }

  def all: Seq[Q] = Seq(q132)
}
