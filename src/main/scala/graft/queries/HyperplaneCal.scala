package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.{det, vec}

/** q252: ORACLE-CHECKED random-hyperplane LSH calibration — the full
  * sign-projection → band-bucket → candidate-pair pipeline built
  * from md5-derived ±1 hyperplanes (Charikar 2002 SRP, public), with
  * every candidate pair's plane-agreement count laid against its
  * EXACT cosine similarity. The production ANN path (q51) projects
  * with xxhash64-seeded hyperplanes DuckDB cannot replay, so its
  * accuracy is recall-bounded in spec; THIS query re-expresses the
  * identical mechanics over md5-derived signs — the third LSH family
  * oracle-checked by the q238 recipe (q238 MinHash, q251 SimHash,
  * this one SRP over the embeddings tier).
  *
  * Mechanics: plane p's weight on dim d is ±1 by the low bit of the
  * first 32 md5 bits of "p:d" (16 planes × 64 dims); the projection
  * is the ±-signed sequential fold over the double-widened vector
  * (the q50 dot-product order, bit-identical cross-engine); sign bit
  * s_p = 1 iff proj > 0; the 16 sign bits pack into 2 × 8-bit table
  * words; a candidate pair shares ≥ 1 exact table word (pairs
  * disagreeing on ≤ 1 plane are GUARANTEED to collide by
  * pigeonhole); agreement = 16 − Σ bit_count(xor(words)). The SRP
  * guarantee E[agree/16] = 1 − θ/π is the calibration curve the
  * per-bucket mean-cosine column exhibits.
  *
  * Determinism: plane signs are md5-derived constants (the Spark
  * plan bakes them as literals computed by the same MD5; the oracle
  * derives them in SQL — a hash match PROVES the derivations agree);
  * projections and cosines are fixed sequential IEEE folds over
  * identical doubles (the q50 proof); pair cosine quantizes D18_6
  * before the exact decimal per-bucket sums (q129 rule).
  *
  * Scale shape: projections are one codegen'd pass over the cached
  * (vec_id, v) frame — 16 fused ±chains, no explode; only (table,
  * word, id) triples ride the candidate exchange; exact cosine is
  * computed for CANDIDATE pairs only (volume bounded by the 8-bit
  * bucketing — 256 cells/table keeps same-cell population ~n/256).
  * Output ≤ 17 calibration rows. Audit cadence; q51 stays the
  * production path.
  */
object HyperplaneCal {

  private val Planes = 16
  private val Dims = 64
  private val Tables = 2
  private val BitsPerTable = Planes / Tables

  /** ±1.0 weight of plane p on 1-based dim d: low bit of the first
    * 32 bits of md5("p:d") — the same derivation the oracle performs
    * with DuckDB's md5().
    */
  private def sign(p: Int, d: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
    if ((h(3) & 1) == 1) 1.0 else -1.0
  }

  val q252 = Q.of(
    "q252_hyperplane_calibration", {
      val packW = (0 until Tables).map { tb =>
        s"CAST(SUM(CASE WHEN p // $BitsPerTable = $tb THEN s * (1 << (p % $BitsPerTable)) ELSE 0 END) AS BIGINT) AS w$tb"
      }.mkString(",\n      |    ")
      val bandSelects = (0 until Tables)
        .map(tb => s"SELECT vec_id, $tb AS b, w$tb AS wv FROM sigv")
        .mkString("\n      |  UNION ALL ")
      val hammingSql = (0 until Tables)
        .map(tb => s"bit_count(xor(sa.w$tb, sb.w$tb))").mkString(" + ")
      s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), r AS (
      |  SELECT p, list_transform(range(1, ${Dims + 1}),
      |    d -> CASE WHEN CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8)) AS BIGINT) & 1 = 1
      |      THEN 1.0 ELSE -1.0 END) AS rv
      |  FROM (SELECT unnest(range(0, $Planes)) AS p)
      |), sgn AS (
      |  SELECT vec_id, p,
      |    CASE WHEN list_dot_product(v, rv) > 0 THEN 1 ELSE 0 END AS s
      |  FROM e CROSS JOIN r
      |), sigv AS (
      |  SELECT vec_id,
      |    $packW
      |  FROM sgn GROUP BY vec_id
      |), bk AS (
      |  $bandSelects
      |), pairs AS (
      |  SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
      |  FROM bk x JOIN bk y ON x.b = y.b AND x.wv = y.wv AND x.vec_id < y.vec_id
      |), scored AS (
      |  SELECT $Planes - CAST($hammingSql AS BIGINT) AS agree,
      |    CAST(CAST(list_dot_product(ea.v, eb.v)
      |        / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
      |      AS DECIMAL(18,6)) AS DOUBLE) AS cosd
      |  FROM pairs
      |  JOIN sigv sa ON sa.vec_id = pairs.va
      |  JOIN sigv sb ON sb.vec_id = pairs.vb
      |  JOIN e ea ON ea.vec_id = pairs.va
      |  JOIN e eb ON eb.vec_id = pairs.vb
      |)
      |SELECT agree,
      |  CAST(agree AS DOUBLE) / $Planes.0 AS est_match,
      |  COUNT(*) AS n_pairs,
      |  CAST(SUM(CAST(cosd AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_cos,
      |  MIN(cosd) AS min_cos,
      |  MAX(cosd) AS max_cos
      |FROM scored GROUP BY agree
      |ORDER BY agree""".stripMargin
    }) { t =>
    calibrate(Ann.vectors(t))
  }

  /** The calibration plan over a cached (vec_id, v: array<double>)
    * frame. Factored so the spec can pin a vector against itself
    * (agree 16, cos 1), the pigeonhole collision guarantee, and the
    * sign derivation against a hand MD5.
    */
  def calibrate(e: DataFrame): DataFrame = {
    // projection for plane p: the ±-signed sequential fold — the
    // identical left-fold order DuckDB's list_dot_product uses, so
    // the double is bit-identical (v[d] * ±1.0 is exact)
    def proj(p: Int) = (1 to Dims)
      .map(d => element_at(col("v"), d) * lit(sign(p, d)))
      .reduce(_ + _)
    val signCols = (0 until Planes).map(p =>
      when(proj(p) > 0, 1L).otherwise(0L).as(s"s$p"))
    val signed = e.select(col("vec_id") +: signCols: _*)
    val packCols = (0 until Tables).map { tb =>
      (0 until BitsPerTable).map { j =>
        col(s"s${tb * BitsPerTable + j}") * lit(1L << j)
      }.reduce(_ + _).cast("long").as(s"w$tb")
    }
    val sigv = graft.CacheScope.trackedCache(
      signed.select(col("vec_id") +: packCols: _*))
    val bk = sigv.select(col("vec_id"),
      posexplode(array((0 until Tables).map(tb => col(s"w$tb")): _*))
        .as(Seq("b", "wv")))
    val pairs = bk.as("x")
      .join(bk.as("y"),
        col("x.b") === col("y.b") && col("x.wv") === col("y.wv") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
      .distinct()
    val hamming = (0 until Tables)
      .map(tb => expr(s"bit_count(wa$tb ^ wb$tb)").cast("long"))
      .reduce(_ + _)
    val scored = pairs
      .join(sigv.select(col("vec_id").as("va") +:
        (0 until Tables).map(tb => col(s"w$tb").as(s"wa$tb")): _*), Seq("va"))
      .join(sigv.select(col("vec_id").as("vb") +:
        (0 until Tables).map(tb => col(s"w$tb").as(s"wb$tb")): _*), Seq("vb"))
      .join(e.select(col("vec_id").as("va"), col("v").as("xa")), Seq("va"))
      .join(e.select(col("vec_id").as("vb"), col("v").as("xb")), Seq("vb"))
      .select((lit(Planes.toLong) - hamming).as("agree"),
        vec.cosim(col("xa"), col("xb")).cast(det.D18_6).cast("double")
          .as("cosd"))
    scored.groupBy(col("agree"))
      .agg(
        count(lit(1)).as("n_pairs"),
        (sum(col("cosd").cast(det.D18_6)).cast("double")
          / count(lit(1)).cast("double")).as("mean_cos"),
        min(col("cosd")).as("min_cos"),
        max(col("cosd")).as("max_cos"))
      .select(col("agree"),
        (col("agree").cast("double") / lit(Planes.toDouble)).as("est_match"),
        col("n_pairs"), col("mean_cos"), col("min_cos"), col("max_cos"))
      .orderBy(col("agree"))
  }

  def all: Seq[Q] = Seq(q252)
}
