package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** q215: DICTIONARY-ENCODING ADVISOR — the columnar-storage sizing
  * decision (dictionary vs plain encoding, the Parquet/ORC writer's
  * choice, public format specs) computed as a query over the actual
  * data: per candidate column — rows, distinct values, exact plain
  * bytes (Σ octet_length), exact dictionary bytes (Σ distinct
  * octet_length + n · index_bytes with index_bytes =
  * ⌈⌈log₂ d⌉ / 8⌉), the savings in basis points, and the advice.
  * Pairs with the layout tier (q92 compaction, q98 z-order, q132
  * compression quality) and the advisor tier (q196 salting, q212
  * join order): the engine-economics decisions AS data.
  *
  * Determinism: everything is exact integer arithmetic — the only
  * subtle token is ⌈log₂ d⌉, computed WITHOUT libm as
  * length(bin(d − 1)) (the binary bit-length; identical builtin in
  * both engines), so there is no floating point anywhere; savings_bp
  * = (plain − dict)·10000 div plain is the q196 exact-floor rule.
  *
  * Scale shape: each column contributes ONE column-pruned scan
  * folding to (Σ bytes) + a distinct aggregate whose exchange carries
  * the column's distinct values (the same pass a real writer's dict
  * page builder makes); output one row per column. At 100 TB this is
  * the stats pass a table-format maintenance job already runs.
  */
object DictAdvisor {

  /** One advisor row for a (table, column) pair. */
  def advise(df: DataFrame, table: String, column: String): DataFrame = {
    val c = col(column).cast("string")
    val plain = df.agg(
      count(lit(1)).as("n_rows"),
      sum(octet_length(c).cast("long")).as("plain_bytes"))
    val dict = df.select(c.as("v")).distinct()
      .agg(count(lit(1)).as("n_distinct"),
        sum(octet_length(col("v")).cast("long")).as("graft_dictpage"))
    plain.join(broadcast(dict))
      .select(
        lit(table).as("tab"), lit(column).as("col"),
        col("n_rows"), col("n_distinct"),
        col("plain_bytes"), col("graft_dictpage"))
      .withColumn("graft_bits",
        when(col("n_distinct") <= 1, lit(1L))
          .otherwise(length(bin(col("n_distinct") - 1)).cast("long")))
      .withColumn("index_bytes",
        floor((col("graft_bits") + 7) / 8).cast("long"))
      .withColumn("dict_bytes",
        col("graft_dictpage") + col("n_rows") * col("index_bytes"))
      .select(col("tab"), col("col"), col("n_rows"), col("n_distinct"),
        col("plain_bytes"), col("dict_bytes"), col("index_bytes"),
        floor((col("plain_bytes") - col("dict_bytes")) * 10000
          / col("plain_bytes")).as("savings_bp"),
        when(col("dict_bytes") < col("plain_bytes"), "dictionary")
          .otherwise("plain").as("advice"))
  }

  private def adviseSql(table: String, column: String): String =
    s"""SELECT '$table' AS tab, '$column' AS col,
       |  n_rows, n_distinct, plain_bytes,
       |  dictpage + n_rows * ((bits + 7) // 8) AS dict_bytes,
       |  (bits + 7) // 8 AS index_bytes,
       |  CAST(FLOOR((plain_bytes - (dictpage + n_rows * ((bits + 7) // 8)))
       |    * 10000 / plain_bytes) AS BIGINT) AS savings_bp,
       |  CASE WHEN dictpage + n_rows * ((bits + 7) // 8) < plain_bytes
       |    THEN 'dictionary' ELSE 'plain' END AS advice
       |FROM (
       |  SELECT p.n_rows, p.plain_bytes, d.n_distinct, d.dictpage,
       |    CASE WHEN d.n_distinct <= 1 THEN 1
       |      ELSE LENGTH(bin(d.n_distinct - 1)) END AS bits
       |  FROM (
       |    SELECT COUNT(*) AS n_rows,
       |      CAST(SUM(strlen(CAST($column AS VARCHAR))) AS BIGINT)
       |        AS plain_bytes
       |    FROM $table) p
       |  CROSS JOIN (
       |    SELECT COUNT(*) AS n_distinct,
       |      CAST(SUM(strlen(v)) AS BIGINT) AS dictpage
       |    FROM (SELECT DISTINCT CAST($column AS VARCHAR) AS v
       |          FROM $table) t) d
       |)""".stripMargin

  private val Candidates = Seq(
    ("lineitem", "l_returnflag"), ("lineitem", "l_linestatus"),
    ("orders", "o_orderpriority"), ("orders", "o_orderstatus"),
    ("customer", "c_mktsegment"), ("part", "p_brand"))

  val q215 = Q.of(
    "q215_dict_advisor",
    Candidates.map { case (t, c) => adviseSql(t, c) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY tab, col"))  { t =>
    val frames = Candidates.map { case (tab, c) =>
      val df = tab match {
        case "lineitem" => t.lineitem
        case "orders"   => t.orders
        case "customer" => t.customer
        case "part"     => t.part
      }
      advise(df.select(col(c)), tab, c)
    }
    frames.reduce(_ unionAll _).orderBy(col("tab"), col("col"))
  }

  def all: Seq[Q] = Seq(q215)
}
