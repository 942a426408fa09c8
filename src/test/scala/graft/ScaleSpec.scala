package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup => D}

/** Scale-growth regression: the §5 claim that the expensive stages of
  * the dedup tier grow ~linearly with the corpus, demonstrated on the
  * 10× jump sf0.001 → sf0.1 (500 → 5000 docs).
  *
  * What is and isn't linear (measured via graft.tools.ScaleCheck,
  * r3): the banded shuffle is exactly linear (16 triples per doc);
  * the raw band-collision pair set has a quadratic component with a
  * tiny constant (7 → 58 candidates/doc here — random same-vocabulary
  * pairs colliding at p≈0.8%), which the signature-agreement
  * prefilter collapses BEFORE anything expensive runs: the est≥0.6
  * verify volume went 28 → 256 pairs for 10× docs, i.e. linear. At
  * corpus sizes where even the raw pair ids get heavy, rowsPerBand
  * grows with log(n) (documented in operators/Dedup.scala) — the knob
  * this spec pins is the prefilter's job, not the banding constant.
  */
class ScaleSpec extends SparkSpec {

  test("minhash exact-verify volume grows ~linearly over a 10x corpus jump") {
    def measure(dir: String): (Long, Long) = {
      val docs = Tables(spark, dir).documents
      val n = docs.count()
      val sigs = D.withMinHashFromText(docs, "text", n = 5, numHashes = 64)
      val verified = D.minHashCandidates(sigs, "doc_id", bands = 16, rowsPerBand = 4)
        .filter(col("est_jaccard") >= 0.6)
        .count()
      spark.catalog.clearCache()
      (n, verified)
    }
    val (n1, v1) = measure("/root/testdata/sf0.001")
    val (n2, v2) = measure("/root/testdata/sf0.1")
    info(s"verify volume: $v1 pairs @ $n1 docs -> $v2 pairs @ $n2 docs")
    assert(n2 >= 10 * n1, "testdata shape changed; pick dirs 10x apart")
    val perDoc1 = v1.toDouble / n1
    val perDoc2 = v2.toDouble / n2
    // linear growth keeps pairs-per-doc constant; allow 2x slack for
    // corpus composition (quadratic growth would be ~10x)
    assert(perDoc2 <= 2.0 * perDoc1,
      f"verify volume superlinear: $perDoc1%.3f -> $perDoc2%.3f pairs/doc over 10x")
  }
}
