package graft.queries

import graft.Q

/** q122: the SQL SURFACE under the oracle gate — the whole query is a
  * `spark.sql` STRING using graft's registered native functions
  * ([[graft.SqlFunctions]]), proving a pure-SQL user gets the same
  * verified semantics as the Column API: exact 5-gram jaccard
  * (`graft_text_jaccard`, the q43 verify primitive) over the adjacent
  * doc-id pairs, with the ≥ 0.8 near-dup verdict. Adjacent pairs keep
  * the demonstration LINEAR (one row per doc; the production pair
  * source is the banded LSH candidate stream — q41/q43 — never
  * all-pairs). The oracle re-derives the same jaccard from DuckDB
  * list algebra, so the native expression, the SQL registration
  * round-trip, AND the function-resolution path are all inside the
  * hash compare.
  */
object SqlSurface {

  val q122 = Q.of(
    "q122_sql_surface",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 1), 1),
      |                                 i -> substr(text, i, 5))) AS s
      |  FROM documents
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.s, b.s))), 4) AS jac5,
      |  CASE WHEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |            / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
      |       THEN 'dup' ELSE 'ok' END AS verdict
      |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
      |ORDER BY doc_a""".stripMargin) { t =>
    graft.SqlFunctions.registerAll(t.spark)
    t.documents.createOrReplaceTempView("graft_docs_q122")
    t.spark.sql(
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(graft_text_jaccard(a.text, b.text, 5), 4) AS jac5,
        |  CASE WHEN graft_text_jaccard(a.text, b.text, 5) >= 0.8
        |       THEN 'dup' ELSE 'ok' END AS verdict
        |FROM graft_docs_q122 a JOIN graft_docs_q122 b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_a""".stripMargin)
  }

  def all: Seq[Q] = Seq(q122)
}
