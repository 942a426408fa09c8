package graft

import org.apache.spark.sql.functions._

/** q222 split leakage / q223 cross-source overlap: planted-duplicate
  * fixtures via the registered queries' own building blocks, plus the
  * structural invariants the synthetic corpus can't exercise at every
  * SF (exact dups only exist at sf0.1+).
  */
class EvalIntegritySpec extends SparkSpec {

  test("q222 the id-keyed split leaks exactly the planted duplicates") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    import scala.jdk.CollectionConverters._
    // 400 unique docs + every doc_id in 400-419 duplicating doc 1's
    // text: whatever splits the naive id-keyed rule assigns, every
    // copy that lands in val/test MUST be flagged iff at least one
    // copy (or the original) landed in train.
    val rows = ((1L to 400L).map(i => (i, s"unique text $i")) ++
      (400L until 420L).map(i => (i + 1000L, "unique text 1")))
      .map { case (id, tx) => Row(id, tx) }
    val docs = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("doc_id BIGINT, text STRING"))
    val tagged = docs.select(
      md5(col("text")).as("h"),
      when(md5(col("doc_id").cast("string")) < "cccd", "train")
        .when(md5(col("doc_id").cast("string")) < "e666", "val")
        .otherwise("test").as("split"))
    val trainH = tagged.filter(col("split") === "train").select("h").distinct()
    val leakedWant = tagged.filter(col("split") =!= "train")
      .join(trainH, Seq("h"), "left_semi").count()
    // replicate q222's aggregate on the fixture and compare totals
    val got = tagged.filter(col("split") =!= "train")
      .join(trainH.withColumn("graft_in_train", lit(1L)), Seq("h"), "left")
      .agg(sum(when(col("graft_in_train").isNotNull, 1L).otherwise(0L)).as("l"))
      .head.getLong(0)
    assert(got == leakedWant && leakedWant > 0,
      s"planted duplicates not flagged: got $got want $leakedWant")
  }

  test("q222 on the corpus: rates in [0,1], counts consistent") {
    val out = run("q222_split_leakage").collect()
    assert(out.map(_.getString(0)).toSet == Set("test", "val"))
    out.foreach { r =>
      val (n, leaked, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(leaked <= n && rate >= 0.0 && rate <= 1.0)
      assert(rate == leaked.toDouble / n)
    }
  }

  test("q223 matrix is upper-triangular, bounded, and 8-gram-dominant") {
    val out = run("q223_cross_source_dups").collect()
    assert(out.nonEmpty, "no cross-source shared 8-grams at all")
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not canonicalized a < b")
      // an exact duplicate shares ALL its 8-grams, so content dups
      // can never exceed gram overlap support
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L)
    }
    val pairs = out.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length == pairs.length, "duplicate pair rows")
  }
}
