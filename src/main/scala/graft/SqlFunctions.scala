package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.graftx.SqlRegistration

import graft.functions._

/** SQL surface for the native expression tier: after `registerAll`,
  * every graft primitive is callable from plain `spark.sql("...")`
  * text — the library is usable without touching the Column API
  * (the q122 contract; parity with the Column forms is pinned in
  * SqlFunctionsSpec).
  *
  * Parameterized sketches take their knobs as trailing INTEGER
  * LITERALS (`graft_text_minhash(text, 5, 64)`), resolved at
  * registration time — a non-literal knob is a loud analysis error,
  * never a silent per-row re-parameterization.
  */
object SqlFunctions {

  def registerAll(spark: SparkSession): Unit = {
    reg(spark, "graft_cosine", es => CosineSimilarity(es(0), es(1)))
    reg(spark, "graft_cosine_i8", es => CosineSimilarityI8(es(0), es(1)))
    reg(spark, "graft_quantize_i8", es => QuantizeI8(es(0)))
    reg(spark, "graft_simhash64", es => SimHash64(es(0)))
    reg(spark, "graft_text_profile", es => TextProfile(es(0)))
    reg(spark, "graft_compression_stats", es => CompressionStats(es(0)))
    reg(spark, "graft_jaro_winkler", es => JaroWinkler(es(0), es(1)))
    reg(spark, "graft_nearest_centroid", es => NearestCentroid(es(0), es(1)))
    reg(spark, "graft_sig_agreement", es => SignatureAgreement(es(0), es(1)))
    reg(spark, "graft_minhash", es => MinHashSignature(es(0), intKnob(es, 1)))
    reg(spark, "graft_text_minhash",
      es => TextMinHash(es(0), intKnob(es, 1), intKnob(es, 2)))
    reg(spark, "graft_text_jaccard", es => TextJaccard(es(0), es(1), intKnob(es, 2)))
    reg(spark, "graft_hyperplane_buckets",
      es => HyperplaneBuckets(es(0), intKnob(es, 1), intKnob(es, 2)))
  }

  private def reg(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    SqlRegistration.register(spark, name, builder)

  private def intKnob(es: Seq[Expression], pos: Int): Int = es(pos) match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"argument ${pos + 1} must be an integer literal, got $other")
  }
}
