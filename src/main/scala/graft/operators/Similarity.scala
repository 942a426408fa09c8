package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.vec

/** Approximate-similarity operators over embedding columns
  * (SURVEY.md §2 q44, q51, q52; §5 scale rules).
  *
  * Candidate generation is always bucketed — vectors only ever meet
  * inside a shared hash bucket / IVF cell, so the join volume is
  * Σ bucket² instead of n². The projection signature is ONE fold over
  * the vector (Catalyst inlines alias expressions into lambda bodies,
  * so a per-plane scan of the vector would recompute the vector cast
  * per plane — the fold form evaluates it once per row), and the
  * projected frame is cached before band extraction so the self-join
  * and the per-table bucket transform read materialized columns.
  *
  * Hyperplanes come from `xxhash64(plane, dim)` parity — a
  * deterministic ±1 "random" matrix that needs no side table and is
  * identical on every executor. r (bits/table) trades recall for
  * bucket size: at n=500 test scale r=4..8; at 100 TB, r grows with
  * log(n) to keep buckets bounded while L (tables) restores recall.
  */
object Similarity {

  /** Adds `buckets`: array of `tables` bucket ids, each from
    * `bitsPerTable` signed random projections of `vCol` (double array),
    * via the native [[graft.functions.HyperplaneBuckets]] expression
    * (one primitive loop per row; the sign matrix is derived from
    * xxhash64 parity and cached per executor).
    */
  def withHyperplaneBuckets(df: DataFrame, vCol: String, tables: Int, bitsPerTable: Int): DataFrame =
    df.withColumn("buckets",
      graft.functions.sketch.hyperplaneBuckets(col(vCol), tables, bitsPerTable))

  /** Explodes the bucket array to (tbl, bucket) join keys. */
  def explodeBuckets(df: DataFrame): DataFrame =
    df.select(df.columns.map(col).toIndexedSeq :+
      posexplode(col("buckets")).as(Seq("tbl", "bucket")): _*).drop("buckets")

  /** LSH near-duplicate pairs: same (tbl, bucket) in any table, exact
    * cosine verify ≥ threshold (fused native cosine — see
    * [[graft.functions.CosineSimilarity]]). Returns (vec_a, vec_b, cos).
    */
  def lshNearDupPairs(vectors: DataFrame, idCol: String, vCol: String,
      tables: Int, bitsPerTable: Int, minCosine: Double): DataFrame = {
    val bucketed = explodeBuckets(
      withHyperplaneBuckets(vectors, vCol, tables, bitsPerTable))
      .select(col(idCol), col(vCol), col("tbl"), col("bucket"))
      .cache()
    val a = bucketed.select(col(idCol).as("vec_a"), col(vCol).as("v_a"),
      col("tbl"), col("bucket"))
    val b = bucketed.select(col(idCol).as("vec_b"), col(vCol).as("v_b"),
      col("tbl"), col("bucket"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), vec.cosim(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= minCosine)
      .groupBy(col("vec_a"), col("vec_b"))
      .agg(first(col("cos")).as("cos"))
  }

  /** IVF cell assignment: nearest of the broadcast `centroids` by
    * cosine. Returns the input plus `cell` (centroid id). One broadcast
    * nested-loop of |centroids| per row — the classic IVF build scan.
    */
  def assignToCentroids(vectors: DataFrame, centroids: DataFrame,
      idCol: String, vCol: String, cidCol: String, cvCol: String): DataFrame = {
    val scored = vectors.crossJoin(broadcast(centroids))
      .withColumn("graft_cos", vec.cosim(col(vCol), col(cvCol)))
    val w = Window.partitionBy(col(idCol)).orderBy(col("graft_cos").desc, col(cidCol))
    scored.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .withColumnRenamed(cidCol, "cell")
      .drop("graft_rn", "graft_cos", cvCol)
  }
}
