package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q248: interpolated KNESER–NEY bigram scoring (Kneser–Ney 1995;
  * Chen–Goodman 1998 interpolated form, public) — the canonical
  * n-gram smoother, beside q183's add-1 baseline: add-1 butchers
  * probability mass at any realistic vocabulary; KN discounts each
  * seen bigram by d = 0.75 and re-spends the freed mass on the
  * CONTINUATION unigram — p_cont(w₂) ∝ how many distinct contexts
  * w₂ completes, the "San Francisco vs Francisco" insight that made
  * it the standard LM smoother for two decades. Scores the q183 held
  * split: per held doc, mean interpolated-KN conditional probability.
  *
  * Determinism (§6(i), the q95/q183 rule): NO transcendentals —
  * every quantity is integer counts (c₂, c₁, N₁₊(w₁·), N₁₊(·w₂),
  * bigram type total T) and each p is ONE fixed IEEE chain written
  * token-identically on both engines (seen-context branch
  * (c₂−0.75)/c₁ + (0.75·N₁₊(w₁·)/c₁)·(N₁₊(·w₂)/T), unseen-context
  * branch = pure continuation), quantized D20_6 per pair before the
  * order-independent per-doc sum.
  *
  * Scale shape: q183's verbatim — scan-local adjacent-pair
  * projection, model tables are vocab-sized natural-key joins (never
  * broadcast at 100 TB), one doc re-aggregate.
  */
object KneserNey {

  val q248 = Q.of(
    "q248_kneser_ney",
    """WITH d AS (
      |  SELECT doc_id, text, md5(text) < 'cccd' AS is_train FROM documents
      |), pairs AS (
      |  SELECT doc_id, is_train, t[i] AS w1, t[i + 1] AS w2
      |  FROM (SELECT doc_id, is_train, string_split(text, ' ') AS t FROM d),
      |    UNNEST(generate_series(1, len(t) - 1)) AS u(i)
      |), c2 AS (
      |  SELECT w1, w2, COUNT(*) AS c2 FROM pairs WHERE is_train GROUP BY 1, 2
      |), c1 AS (
      |  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
      |    COUNT(*) AS n1p FROM c2 GROUP BY 1
      |), cont AS (
      |  SELECT w2, COUNT(*) AS cw FROM c2 GROUP BY 1
      |), tot AS (
      |  SELECT COUNT(*) AS t FROM c2
      |), scored AS (
      |  SELECT p.doc_id,
      |    CASE WHEN c1.c1 IS NOT NULL THEN
      |      (CASE WHEN c2.c2 IS NULL THEN 0.0
      |            ELSE (CAST(c2.c2 AS DOUBLE) - 0.75) END
      |        / CAST(c1.c1 AS DOUBLE))
      |      + ((0.75 * CAST(c1.n1p AS DOUBLE)) / CAST(c1.c1 AS DOUBLE))
      |        * (CAST(COALESCE(cont.cw, 0) AS DOUBLE) / CAST(tot.t AS DOUBLE))
      |    ELSE CAST(COALESCE(cont.cw, 0) AS DOUBLE) / CAST(tot.t AS DOUBLE)
      |    END AS pkn,
      |    CASE WHEN c2.c2 IS NOT NULL THEN 1 ELSE 0 END AS seen
      |  FROM (SELECT * FROM pairs WHERE NOT is_train) p
      |  LEFT JOIN c2 ON c2.w1 = p.w1 AND c2.w2 = p.w2
      |  LEFT JOIN c1 ON c1.w1 = p.w1
      |  LEFT JOIN cont ON cont.w2 = p.w2
      |  CROSS JOIN tot
      |)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(seen) AS BIGINT) AS n_seen,
      |  CAST(SUM(CAST(pkn AS DECIMAL(20,6))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS mean_pkn
      |FROM scored GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { t =>
    val d = t.documents
    val train = d.filter(md5(col("text")) < "cccd")
    val held = d.filter(!(md5(col("text")) < "cccd"))
    score(train, held)
  }

  /** Train interpolated-KN on `train`, score `held` per doc. Factored
    * so the spec can pin hand-computed probabilities (discount mass
    * conservation, the continuation asymmetry, the unseen-context
    * backoff).
    */
  def score(train: DataFrame, held: DataFrame): DataFrame = {
    val c2 = BigramLm.bigrams(train)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(
      sum(col("c2")).cast("long").as("c1"),
      count(lit(1)).as("n1p"))
    val cont = c2.groupBy(col("w2")).agg(count(lit(1)).as("cw"))
    val tot = c2.agg(count(lit(1)).as("t"))
    val contP = coalesce(col("cw"), lit(0L)).cast("double") /
      col("t").cast("double")
    val pkn = when(col("c1").isNotNull,
      (when(col("c2").isNull, lit(0.0))
        .otherwise(col("c2").cast("double") - lit(0.75))
        / col("c1").cast("double"))
        + ((lit(0.75) * col("n1p").cast("double")) / col("c1").cast("double"))
        * contP)
      .otherwise(contP)
    BigramLm.bigrams(held)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), pkn.as("pkn"),
        when(col("c2").isNotNull, 1L).otherwise(0L).as("seen"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("seen")).cast("long").as("n_seen"),
        (sum(col("pkn").cast(det.D20_6)).cast("double")
          / count(lit(1)).cast("double")).as("mean_pkn"))
      .orderBy(col("doc_id"))
  }

  def all: Seq[Q] = Seq(q248)
}
