package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.{det, TextProfile}

/** q218: CONFUSION MATRIX + macro-F1 for the q32 language classifier
  * against the corpus's declared labels — the engine EVALUATING ITS
  * OWN OPERATOR as a query (the dogfooding leg of the scorer-eval
  * tier: q190/q191/q217 grade an abstract score column; this grades a
  * shipped classifier, per class). Per predictable class: tp/fp/fn
  * from the (declared, predicted) cell matrix, precision, recall, F1,
  * and the constant macro-F1 column — the standard multi-class
  * readout (van Rijsbergen F-measure, public). Declared labels
  * OUTSIDE the classifier's {en,de,es,fr} range (the corpus also
  * carries e.g. zh) stay in the matrix as false positives against
  * whatever class absorbed them — stated, not dropped.
  *
  * Determinism: the classifier is q32's integer stopword-hit argmax
  * with its fixed tiebreak; tp/fp/fn are exact integers folded from
  * the bounded cell matrix (q198's marginals-from-the-joint rule —
  * ONE scan); precision/recall/F1 are single IEEE chains over exact
  * integers; macro-F1 quantizes each class F1 at D18_6 (values ≤ 1 —
  * the safe side of the §6(l) ceiling) and divides the exact decimal
  * sum once. Zero-denominator classes guard to NULL and drop out of
  * the macro mean.
  *
  * Scale shape: ONE documents scan → ≤|langs|² cells → class-grain
  * folds; 4 rows out.
  */
object LangEval {

  private val Classes = Seq("en", "de", "es", "fr")

  /** Per-class precision/recall/F1 + macro-F1 over a
    * (declared, predicted) frame. Factored so the spec can pin a
    * hand-built confusion matrix and the guard/macro arithmetic.
    */
  def confusion(df: DataFrame, declared: Column, predicted: Column): DataFrame = {
    val cells = df
      .groupBy(declared.as("graft_d"), predicted.as("graft_p"))
      .agg(count(lit(1)).as("graft_c"))
    val session = cells.sparkSession
    import session.implicits._
    val classes = Classes.toDF("lang")
    val perClass = classes
      .join(
        cells.groupBy(col("graft_p").as("lang"))
          .agg(sum(when(col("graft_d") === col("graft_p"), col("graft_c"))
            .otherwise(0L)).as("tp"),
            sum(when(col("graft_d") =!= col("graft_p"), col("graft_c"))
              .otherwise(0L)).as("fp")),
        Seq("lang"), "left")
      .join(
        cells.groupBy(col("graft_d").as("lang"))
          .agg(sum(when(col("graft_d") =!= col("graft_p"), col("graft_c"))
            .otherwise(0L)).as("fn")),
        Seq("lang"), "left")
      .na.fill(0L, Seq("tp", "fp", "fn"))
    val p = when(col("tp") + col("fp") > 0,
      col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
    val r = when(col("tp") + col("fn") > 0,
      col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
    val scored = perClass.select(
      col("lang"), col("tp"), col("fp"), col("fn"),
      p.as("precision"), r.as("recall"),
      when(p.isNotNull && r.isNotNull && p + r > 0.0,
        lit(2.0) * p * r / (p + r)).as("f1"))
    val macroF = scored.agg(
      sum(col("f1").cast(det.D18_6)).as("graft_sf"),
      count(col("f1")).as("graft_k"))
      .select((col("graft_sf").cast("double")
        / col("graft_k").cast("double")).as("macro_f1"))
    scored.join(broadcast(macroF))
  }

  val q218 = Q.of(
    "q218_langid_confusion",
    """WITH scored AS (
      |  SELECT lang AS declared,
      |    CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
      |         WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
      |         WHEN es_hits >= fr_hits THEN 'es'
      |         ELSE 'fr' END AS predicted
      |  FROM (
      |    SELECT lang,
      |      len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is)\b')) AS en_hits,
      |      len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|ein)\b')) AS de_hits,
      |      len(regexp_extract_all(text, '\b(el|los|las|una|es|y|que)\b')) AS es_hits,
      |      len(regexp_extract_all(text, '\b(le|les|des|et|est|une|dans)\b')) AS fr_hits
      |    FROM documents
      |  )
      |), cells AS (
      |  SELECT declared AS d, predicted AS p, COUNT(*) AS c
      |  FROM scored GROUP BY 1, 2
      |), classes AS (
      |  SELECT 'en' AS lang UNION ALL SELECT 'de'
      |  UNION ALL SELECT 'es' UNION ALL SELECT 'fr'
      |), perclass AS (
      |  SELECT classes.lang,
      |    COALESCE(tpfp.tp, 0) AS tp,
      |    COALESCE(tpfp.fp, 0) AS fp,
      |    COALESCE(fns.fn, 0) AS fn
      |  FROM classes
      |  LEFT JOIN (
      |    SELECT p AS lang,
      |      CAST(SUM(CASE WHEN d = p THEN c ELSE 0 END) AS BIGINT) AS tp,
      |      CAST(SUM(CASE WHEN d <> p THEN c ELSE 0 END) AS BIGINT) AS fp
      |    FROM cells GROUP BY 1) tpfp ON tpfp.lang = classes.lang
      |  LEFT JOIN (
      |    SELECT d AS lang,
      |      CAST(SUM(CASE WHEN d <> p THEN c ELSE 0 END) AS BIGINT) AS fn
      |    FROM cells GROUP BY 1) fns ON fns.lang = classes.lang
      |), sc AS (
      |  SELECT lang, tp, fp, fn,
      |    CASE WHEN tp + fp > 0
      |      THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
      |    CASE WHEN tp + fn > 0
      |      THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
      |    CASE WHEN (CASE WHEN tp + fp > 0
      |        THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END) IS NOT NULL
      |      AND (CASE WHEN tp + fn > 0
      |        THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END) IS NOT NULL
      |      AND (CASE WHEN tp + fp > 0
      |        THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END)
      |        + (CASE WHEN tp + fn > 0
      |        THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END) > 0.0
      |      THEN 2.0 * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
      |        * (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
      |        / ((CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
      |          + (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)))
      |      END AS f1
      |  FROM perclass
      |), m AS (
      |  SELECT CAST(SUM(CAST(f1 AS DECIMAL(18,6))) AS DOUBLE)
      |    / CAST(COUNT(f1) AS DOUBLE) AS macro_f1
      |  FROM sc
      |)
      |SELECT lang, tp, fp, fn, precision, recall, f1, macro_f1
      |FROM sc CROSS JOIN m
      |ORDER BY lang""".stripMargin) { t =>
    val prof = TextProfile(col("text"))
    val scored = t.documents.select(col("lang").as("declared"),
      prof.getField("en_hits").as("en_hits"),
      prof.getField("de_hits").as("de_hits"),
      prof.getField("es_hits").as("es_hits"),
      prof.getField("fr_hits").as("fr_hits"))
      .withColumn("predicted",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits")
          && col("en_hits") >= col("fr_hits"), "en")
          .when(col("de_hits") >= col("es_hits")
            && col("de_hits") >= col("fr_hits"), "de")
          .when(col("es_hits") >= col("fr_hits"), "es")
          .otherwise("fr"))
    confusion(scored, col("declared"), col("predicted"))
      .orderBy(col("lang"))
  }

  def all: Seq[Q] = Seq(q218)
}
