package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{Dedup => D, Similarity}
import graft.functions.vec

/** Prints LSH candidate volumes at two scale factors — the §5
  * "candidate volume stays ~linear" evidence run (VERDICT r2 #9).
  * Pass table dirs as args to measure other jumps (e.g. the GenScale
  * sf1 output for the sf0.1 -> sf1 decade).
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val t = Tables(spark, dir)
      val nDocs = t.documents.count()
      val sigs = D.withMinHashFromText(t.documents, "text", n = 5, numHashes = 64)
      val banded = D.minHashCandidates(sigs, "doc_id", bands = 16, rowsPerBand = 4)
      val raw = banded.count()
      val prefiltered = banded.filter(col("est_jaccard") >= 0.6).count()
      val nVecs = t.embeddings.count()
      val e = t.embeddings.select(col("vec_id"), vec.toDoubleArr(col("embedding")).as("v"))
      val annPairs = Similarity.lshNearDupPairs(e, "vec_id", "v",
        tables = 16, bitsPerTable = 4, minCosine = 0.4).count()
      // q51-shape: bucket-cogroup candidate count (8 tables x 4 bits)
      val bucketed = Similarity.explodeBuckets(
        Similarity.withHyperplaneBuckets(e, "v", tables = 8, bitsPerTable = 4))
        .select(col("vec_id"), col("tbl"), col("bucket"))
      val q = bucketed.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("query_id"), col("tbl"), col("bucket"))
      val annCands = q.join(bucketed, Seq("tbl", "bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select("query_id", "vec_id").distinct().count()
      println(s"SCALECHECK dir=$dir nDocs=$nDocs minhashRaw=$raw minhashPrefiltered=$prefiltered " +
        s"nVecs=$nVecs nQueries=${nVecs / 50} nearDupPairs=$annPairs annCandidates=$annCands")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
