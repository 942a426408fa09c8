package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.JaroWinkler

/** q152: JARO-WINKLER fuzzy matching — q133's blocked record linkage
  * re-scored with the transposition-tolerant similarity metric (the
  * native [[graft.functions.JaroWinkler]] expression): levenshtein
  * charges a swapped pair 2 edits and a shared prefix nothing, while
  * Jaro-Winkler counts swaps as half-transpositions and BOOSTS
  * agreeing prefixes — the Census-linkage standard for human-entered
  * names. Same blocking discipline as q133 (name-DISTINCT entities,
  * candidates only within the head-noun block — Σ|block|² over
  * entities, never catalog²); the scorer swaps in.
  *
  * Determinism: the expression matches DuckDB's
  * `jaro_winkler_similarity` parameterization exactly; the score is
  * rounded to 4 BEFORE the match gate so the kept-pair SET is decided
  * on identical numbers on both sides (a raw-score gate would let a
  * 1-ulp disagreement flip a boundary pair in or out).
  */
object JaroMatch {

  private val Gate = 0.85

  /** Blocked JW-scored pairs over a (name) entity frame. Factored so
    * the spec can pin textbook scores and the gate boundary.
    */
  def blockedPairs(entities: DataFrame, gate: Double): DataFrame = {
    val named = entities
      .groupBy(col("name")).agg(count(lit(1)).as("n_members"))
      .withColumn("block", element_at(split(col("name"), " "), -1))
    named.as("l").join(named.as("r"),
        col("l.block") === col("r.block") && col("l.name") < col("r.name"))
      .select(
        col("l.name").as("name_a"), col("r.name").as("name_b"),
        round(JaroWinkler(col("l.name"), col("r.name")), 4).as("jw"),
        col("l.n_members").as("support_a"), col("r.n_members").as("support_b"))
      .filter(col("jw") >= gate)
  }

  val q152 = Q.of(
    "q152_jaro_winkler_match",
    s"""WITH named AS (
      |  SELECT p_name AS name, COUNT(*) AS n_members,
      |    split_part(p_name, ' ', -1) AS block
      |  FROM part GROUP BY p_name
      |)
      |SELECT l.name AS name_a, r.name AS name_b,
      |  round(jaro_winkler_similarity(l.name, r.name), 4) AS jw,
      |  CAST(l.n_members AS BIGINT) AS support_a,
      |  CAST(r.n_members AS BIGINT) AS support_b
      |FROM named l JOIN named r
      |  ON l.block = r.block AND l.name < r.name
      |WHERE round(jaro_winkler_similarity(l.name, r.name), 4) >= 0.85
      |ORDER BY name_a, name_b""".stripMargin) { t =>
    blockedPairs(t.part.select(col("p_name").as("name")), Gate)
      .orderBy(col("name_a"), col("name_b"))
  }

  def all: Seq[Q] = Seq(q152)
}
