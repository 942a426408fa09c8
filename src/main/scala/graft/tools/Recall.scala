package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Registry, Tables}
import graft.functions.vec

/** Sketch-tier quality artifact (VERDICT r8 "next" #7): the rows-only
  * queries are graded by recall floors and error bounds that until now
  * lived only inside ScalaTest assertions — this main re-computes the
  * same numbers the specs pin and emits them as ONE JSON file
  * (`RECALL_r{N}.json` next to the round's correctness artifact), so
  * the scorecard can grade the sketch tiers without reading test
  * source.
  *
  * Every metric mirrors its spec's computation 1:1 (AnnSpec recall@10
  * vs the exact q50 baseline; DedupSpec pair recall vs the
  * oracle-checked q43 truth and the brute-force cosine graph;
  * CurationSpec Bloom FN/FP accounting; OperatorsSpec/EtlSpec sketch
  * error bounds) and carries the spec's floor/bound plus a pass flag.
  *
  * Usage: runMain graft.tools.Recall [sfDir] [outPath]
  */
object Recall {

  private def topk(df: DataFrame): Map[Long, Seq[Long]] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .groupBy(_._1).map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }

  private def recallAt10(exact: Map[Long, Seq[Long]],
      approx: Map[Long, Seq[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      truth.count(approx.getOrElse(q, Seq.empty).toSet).toDouble / truth.size
    }
    per.sum / per.size
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outPath = if (args.length > 1) args(1) else "RECALL.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    def run(name: String): DataFrame = {
      val df = Registry.byName(name).run(spark, sfDir)
      df
    }
    def fresh[T](f: => T): T = { val r = f; spark.catalog.clearCache(); r }

    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    def put(key: String, value: Double, floor: Double, pass: Boolean,
        kind: String): Unit =
      out(key) = f"""{"value": $value%.4f, "$kind": $floor%.4f, "pass": $pass}"""

    // ---- ANN recall@10 vs exact brute force (AnnSpec floors) ----
    val exactAnn = fresh(topk(run("q50_ann_bruteforce")))
    val r51 = fresh(recallAt10(exactAnn, topk(run("q51_ann_lsh"))))
    val r52 = fresh(recallAt10(exactAnn, topk(run("q52_centroid_ivf"))))
    val r53 = fresh(recallAt10(exactAnn, topk(run("q53_ann_quantized"))))
    val r54 = fresh(recallAt10(exactAnn, topk(run("q54_ann_rerank"))))
    val r83 = fresh(recallAt10(exactAnn, topk(run("q83_ann_ivf_rerank"))))
    val r88 = fresh(recallAt10(exactAnn, topk(run("q88_ann_pq"))))
    val r89 = fresh(recallAt10(exactAnn, topk(run("q89_ann_ivfadc"))))
    put("q51_ann_lsh_recall_at10", r51, 0.35, r51 >= 0.35, "floor")
    put("q52_centroid_ivf_recall_at10", r52, 0.35, r52 >= 0.35, "floor")
    put("q53_ann_quantized_recall_at10", r53, 0.8, r53 >= 0.8, "floor")
    // q54's contract is two-stage >= one-stage (re-rank cannot lose)
    put("q54_ann_rerank_recall_at10", r54, r53, r54 >= r53, "floor")
    // q83/q89 track the q52 probed-cell ceiling within 0.05
    put("q83_ann_ivf_rerank_recall_at10", r83,
      math.max(0.3, r52 - 0.05), r83 >= r52 - 0.05 && r83 >= 0.3, "floor")
    put("q88_ann_pq_recall_at10", r88, 0.7, r88 >= 0.7, "floor")
    put("q89_ann_ivfadc_recall_at10", r89,
      math.max(0.3, r52 - 0.05), r89 >= r52 - 0.05 && r89 >= 0.3, "floor")

    // ---- near-dup pair recall vs the oracle-checked q43 truth ----
    val truePairs = fresh(run("q43_dedup_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val got41 = fresh(run("q41_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val r41 = truePairs.count(got41).toDouble / truePairs.size
    put("q41_dedup_minhash_pair_recall", r41, 1.0, r41 == 1.0, "floor")
    val got42 = fresh(run("q42_dedup_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val r42 = truePairs.count(got42).toDouble / truePairs.size
    put("q42_dedup_simhash_pair_recall", r42, 0.8, r42 >= 0.8, "floor")

    // ---- q44 embedding LSH vs brute-force cosine pair graph ----
    val e = t.embeddings
      .select(col("vec_id"), vec.toDoubleArr(col("embedding")).as("v"))
    val exact44 = e.select(col("vec_id").as("ia"), col("v").as("va"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("v").as("vb")))
      .filter(col("ia") < col("ib"))
      .withColumn("cos", vec.cosim(col("va"), col("vb")))
      .filter(col("cos") >= 0.4)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got44 = fresh(run("q44_dedup_embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val r44 = got44.size.toDouble / exact44.size
    val precise44 = got44.subsetOf(exact44)
    put("q44_dedup_embedding_pair_recall", r44, 0.7, r44 >= 0.7 && precise44, "floor")
    out("q44_dedup_embedding_precision") =
      s"""{"value": ${if (precise44) 1.0 else 0.0}, "floor": 1.0, "pass": $precise44}"""

    // ---- q91 Bloom: no false negatives vs exact q85, FP in budget ----
    val exact85 = fresh(run("q85_contamination").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit_shingles")).toMap)
    val bloom91 = fresh(run("q91_contamination_bloom").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_flagged_shingles")).toMap)
    val fn = exact85.count { case (d, n) =>
      !bloom91.contains(d) || bloom91(d) < n }
    val fp = (bloom91.keySet -- exact85.keySet).size
    val corpusDocs = fresh(run("q84_quality_filters").count())
    val fpBudget = math.max(5L, corpusDocs / 20).toDouble
    put("q91_bloom_false_negatives", fn.toDouble, 0.0, fn == 0, "bound")
    put("q91_bloom_false_positives", fp.toDouble, fpBudget, fp <= fpBudget, "bound")

    // ---- sketch error bounds (OperatorsSpec / EtlSpec) ----
    val exact10 = fresh(run("q10_percentile").collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap)
    val approx10 = fresh(run("q10b_approx_percentile").collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap)
    val dev10b = approx10.flatMap { case (flag, ap) =>
      ap.zip(exact10(flag)).map { case (a, ex) =>
        math.abs(a - ex) / math.max(0.05 * math.abs(ex), 1.0) * 0.05 }
    }.max // scaled so the spec's max(5% rel, 1.0 abs) bound maps to 0.05
    put("q10b_approx_percentile_max_rel_err", dev10b, 0.05, dev10b <= 0.05, "bound")

    val err25 = t.orders.groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey")).as("a"),
        countDistinct(col("o_custkey")).as("e"))
      .collect().map(r => math.abs(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(2))
      .max
    put("q25_approx_distinct_max_rel_err", err25, 0.10, err25 < 0.10, "bound")

    val viaState = fresh(run("q100_hll_merge").collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        r.getAs[Long]("approx_distinct_orders")).toMap)
    val exactHll = t.lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    val err100 = viaState.map { case (f, est) =>
      math.abs(est - exactHll(f)).toDouble / exactHll(f) }.max
    put("q100_hll_merge_max_rel_err", err100, 0.05, err100 < 0.05, "bound")

    // ---- q187 KMV retention vs the exact q176 bitmap algebra ----
    val exact176 = fresh(run("q176_bitmap_retention").collect()
      .map(r => r.getAs[Number](0).longValue ->
        (r.getAs[Number](1).longValue, r.getAs[Number](2).longValue)).toMap)
    val kmv187 = fresh(run("q187_kmv_retention").collect()
      .map(r => r.getAs[Number](0).longValue ->
        (r.getDouble(1), r.getDouble(2))).toMap)
    // KmvSpec's envelope: 4/sqrt(K) because this is a MAX over ~80
    // months (expected max ~2.7 sigma; 3 sigma flaked on the round-13
    // data regen at 3.1 sigma)
    val envK = 4.0 / math.sqrt(256.0)
    val errActive = kmv187.map { case (mk, (a, _)) =>
      math.abs(a - exact176(mk)._1) /
        math.max(envK * exact176(mk)._1, 3.0) * envK }.max
    val errRetained = kmv187.map { case (mk, (_, r)) =>
      val (ae, re) = exact176(mk)
      math.abs(r - re) /
        math.max(3 * envK * math.max(ae, re + 1.0), 6.0) * (3 * envK) }.max
    put("q187_kmv_active_max_scaled_err", errActive, envK,
      errActive <= envK, "bound")
    put("q187_kmv_retained_max_scaled_err", errRetained, 3 * envK,
      errRetained <= 3 * envK, "bound")

    val allPass = !out.values.exists(_.contains("\"pass\": false"))
    val json = out.map { case (k, v) => s""""$k": $v""" }
      .mkString("{\n  \"sf_dir\": \"" + sfDir + "\",\n  ", ",\n  ", "\n}")
    Files.writeString(Paths.get(outPath), json)
    println(s"RECALL -> $outPath (all_pass=$allPass)")
    spark.stop()
    if (!allPass) sys.exit(1)
  }
}
