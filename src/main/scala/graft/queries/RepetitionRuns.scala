package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q257: CONSECUTIVE-TOKEN RUN detection — the degenerate-repetition
  * gate ("the the the …") a pretraining corpus runs against
  * generation-loop artifacts and stuck-key noise (the SEQUENTIAL
  * complement of q84's Gopher multiset rules: top-word fraction
  * can't tell 10 scattered "the"s from a 10-long "the" LOOP, and
  * only the loop is a generation artifact). Per doc: the longest run
  * of consecutive identical whitespace tokens, folded per source
  * into the run-length profile (docs at run ≥ 2 / ≥ 3 / ≥ 5, the
  * max, and the mean) a corpus audit reads before setting the cut.
  *
  * Two independent derivations of the same statistic on the two
  * sides of the hash compare (the q84 doctrine): Spark folds each
  * doc's word array IN-ROW with a single `aggregate` (state =
  * (prev, current run, best run) — O(w) per row, zero exchange);
  * the oracle replays it as the classic gaps-and-islands
  * (pos − row_number per (doc, word) → island → COUNT → MAX) over
  * the unnested words. All counts are exact integers; the mean is
  * one IEEE division of exact int64s.
  *
  * Scale shape: a pure map over the documents scan + one
  * |sources|-row map-side-combined rollup. No joins, no windows, no
  * explode on the Spark side.
  */
object RepetitionRuns {

  val q257 = Q.of(
    "q257_repetition_runs",
    """WITH t AS (
      |  SELECT doc_id, source,
      |    unnest(w) AS word, unnest(range(1, len(w) + 1)) AS pos
      |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w
      |        FROM documents WHERE length(trim(text)) > 0)
      |), g AS (
      |  SELECT doc_id, source, word,
      |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id, word ORDER BY pos)
      |      AS grp
      |  FROM t
      |), runs AS (
      |  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS run
      |  FROM g GROUP BY doc_id, source, word, grp
      |), best AS (
      |  SELECT doc_id, source, MAX(run) AS max_run FROM runs
      |  GROUP BY doc_id, source
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN max_run >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS docs_run2,
      |  CAST(SUM(CASE WHEN max_run >= 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS docs_run3,
      |  CAST(SUM(CASE WHEN max_run >= 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS docs_run5,
      |  MAX(max_run) AS longest_run,
      |  CAST(SUM(max_run) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS mean_max_run
      |FROM best GROUP BY source
      |ORDER BY source""".stripMargin) { t =>
    profile(t.documents)
  }

  /** Adds `max_run` per doc — the in-row fold. Factored so the spec
    * can pin hand-built loops and the no-repeat floor of 1.
    */
  def withMaxRun(docs: DataFrame): DataFrame =
    docs
      .filter(length(trim(col("text"))) > 0)
      .withColumn("max_run", expr(
        """aggregate(split(text, ' '),
          |  named_struct('prev', '', 'cur', 0L, 'best', 0L),
          |  (acc, x) -> named_struct(
          |    'prev', x,
          |    'cur', IF(x = acc.prev, acc.cur + 1L, 1L),
          |    'best', GREATEST(acc.best, IF(x = acc.prev, acc.cur + 1L, 1L))),
          |  acc -> acc.best)""".stripMargin))

  /** The per-source run-length profile. */
  def profile(docs: DataFrame): DataFrame =
    withMaxRun(docs)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("max_run") >= 2, 1L).otherwise(0L)).as("docs_run2"),
        sum(when(col("max_run") >= 3, 1L).otherwise(0L)).as("docs_run3"),
        sum(when(col("max_run") >= 5, 1L).otherwise(0L)).as("docs_run5"),
        max(col("max_run")).as("longest_run"),
        (sum(col("max_run")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_max_run"))
      .orderBy(col("source"))

  def all: Seq[Q] = Seq(q257)
}
