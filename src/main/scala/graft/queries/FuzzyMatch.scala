package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q133: FUZZY ENTITY MATCHING — blocked edit-distance record linkage
  * over the part catalog, the classic master-data / entity-resolution
  * primitive (same product under typo'd or variant names) that none
  * of the equality-keyed dedup tiers (q40 exact, q41/q42 sketch,
  * q43 n-gram) expresses: similarity here is EDIT distance, which
  * tolerates transposed/substituted characters that break every
  * shingle.
  *
  * Scale design — BLOCKING before the quadratic step, the published
  * record-linkage discipline: candidate pairs are generated only
  * WITHIN a block (here the name's last token — the head noun of the
  * catalog's adjective-noun names), so the comparison count is
  * Σ|block|² over name-DISTINCT entities, never catalog², and the
  * block key is a pure projection (no learned model). The distinct
  * projection runs first: 64 names stand for 2 000 parts at sf0.01
  * (and the name space grows like the vocabulary, sublinear in the
  * catalog), so levenshtein — a per-pair O(len²) loop — only ever
  * sees entity pairs. Cross-block misses are the documented
  * recall/cost trade every blocking scheme makes; widen by adding a
  * second blocking pass (e.g. first token) and unioning candidates.
  *
  * Determinism: levenshtein is integer unit-cost edit distance with
  * identical semantics in Spark and DuckDB; support counts are
  * integers — the whole report is exact.
  */
object FuzzyMatch {

  private val MaxDist = 3

  /** Blocked levenshtein pairs over a (name, weight) entity frame.
    * Factored so the spec can pin hand-picked typo pairs, the
    * distance gate, and the cross-block miss.
    */
  def blockedPairs(entities: DataFrame, maxDist: Int): DataFrame = {
    val named = entities
      .groupBy(col("name")).agg(count(lit(1)).as("n_members"))
      .withColumn("block", element_at(split(col("name"), " "), -1))
    named.as("l").join(named.as("r"),
        col("l.block") === col("r.block") && col("l.name") < col("r.name"))
      .select(
        col("l.name").as("name_a"), col("r.name").as("name_b"),
        levenshtein(col("l.name"), col("r.name")).cast("long").as("dist"),
        col("l.n_members").as("support_a"), col("r.n_members").as("support_b"))
      .filter(col("dist") <= maxDist)
  }

  val q133 = Q.of(
    "q133_fuzzy_match",
    s"""WITH named AS (
      |  SELECT p_name AS name, COUNT(*) AS n_members,
      |    split_part(p_name, ' ', -1) AS block
      |  FROM part GROUP BY p_name
      |)
      |SELECT l.name AS name_a, r.name AS name_b,
      |  CAST(levenshtein(l.name, r.name) AS BIGINT) AS dist,
      |  l.n_members AS support_a, r.n_members AS support_b
      |FROM named l JOIN named r
      |  ON l.block = r.block AND l.name < r.name
      |WHERE levenshtein(l.name, r.name) <= $MaxDist
      |ORDER BY name_a, name_b""".stripMargin) { t =>
    blockedPairs(t.part.select(col("p_name").as("name")), MaxDist)
      .orderBy(col("name_a"), col("name_b"))
  }

  def all: Seq[Q] = Seq(q133)
}
