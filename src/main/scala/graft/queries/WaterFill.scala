package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** q270: MAX-MIN FAIR BUDGET ALLOCATION (progressive filling /
  * water-filling, Bertsekas–Gallager 1992, public) — the
  * cap-constrained allocator between q160 (largest-remainder
  * apportionment, no caps) and q184 (mixture targets, no budget):
  * split a global token budget B across sources so every source gets
  * an equal share EXCEPT those whose whole supply fits under the
  * water level — they saturate, and their unused share is
  * redistributed. The standard answer to "sample 10% of the corpus
  * as evenly per source as the small sources allow".
  *
  * Pure integers, no water-level division: with caps sorted
  * ascending, source r saturates iff c_r·(n−r+1) + Σ_{j<r} c_j ≤ B
  * (the level test cleared of its denominator — monotone in r, so
  * the saturated set is the count of passing rows). The remainder
  * after saturation spreads base = rem div u per unsaturated source
  * plus one extra to the first rem mod u of them in source order
  * (the q160 largest-remainder discipline) — Σ alloc = B EXACTLY,
  * cross-engine by construction.
  *
  * Scale shape: the corpus collapses to the |sources| supply frame
  * in one map-side-combined rollup; every window after runs on ≤ 20
  * rows (the source alphabet — the q223 saturation bound; whitelisted
  * in the plan sweep with that rationale). Output |sources| rows.
  */
object WaterFill {

  /** Budget = total corpus chars div this. */
  private val BudgetDiv = 10

  val q270 = Q.of(
    "q270_water_fill",
    s"""WITH supply AS (
      |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS cap
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT source, cap,
      |    CAST(SUM(cap) OVER () AS BIGINT) // $BudgetDiv AS b,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
      |    ROW_NUMBER() OVER (ORDER BY cap, source) AS r,
      |    CAST(COALESCE(SUM(cap) OVER (ORDER BY cap, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS pfx
      |  FROM supply
      |), sat AS (
      |  SELECT *, CASE WHEN cap * (n - r + 1) + pfx <= b THEN 1 ELSE 0 END AS s
      |  FROM tot
      |), m AS (
      |  SELECT *,
      |    CAST(SUM(s) OVER () AS BIGINT) AS n_sat,
      |    CAST(SUM(CASE WHEN s = 1 THEN cap ELSE 0 END) OVER () AS BIGINT)
      |      AS sat_mass
      |  FROM sat
      |), ranked AS (
      |  SELECT *,
      |    b - sat_mass AS rem, n - n_sat AS u,
      |    CASE WHEN s = 0 THEN ROW_NUMBER() OVER (PARTITION BY s ORDER BY source)
      |         ELSE NULL END AS r2
      |  FROM m
      |)
      |SELECT source, cap AS supply,
      |  CAST(CASE WHEN s = 1 THEN cap
      |    ELSE rem // u + (CASE WHEN r2 <= rem % u THEN 1 ELSE 0 END)
      |  END AS BIGINT) AS alloc,
      |  CAST(s AS BIGINT) AS saturated,
      |  CAST(CASE WHEN s = 1 THEN cap
      |    ELSE rem // u + (CASE WHEN r2 <= rem % u THEN 1 ELSE 0 END)
      |  END * 1000 // cap AS BIGINT) AS fill_pm
      |FROM ranked
      |ORDER BY source""".stripMargin) { t =>
    val supply = t.documents.groupBy(col("source"))
      .agg(sum(col("n_chars")).cast("long").as("cap"))
    allocate(supply)
  }

  /** Max-min fair allocation over a (source, cap) frame with
    * B = Σcap div $BudgetDiv. Factored so the spec can plant caps
    * with a hand-computed water level. B < Σcap by construction, so
    * at least one source is always unsaturated (u ≥ 1).
    */
  def allocate(supply: DataFrame): DataFrame = {
    val all = Window.partitionBy()
    val asc = Window.partitionBy().orderBy(col("cap"), col("source"))
    val tot = supply
      .withColumn("b", expr(s"sum(cap) over () div $BudgetDiv"))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("r", row_number().over(asc))
      .withColumn("pfx", coalesce(
        sum(col("cap")).over(asc.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val sat = tot.withColumn("s",
      when(col("cap") * (col("n") - col("r") + 1) + col("pfx") <= col("b"), 1L)
        .otherwise(0L))
    val m = sat
      .withColumn("n_sat", sum(col("s")).over(all))
      .withColumn("sat_mass",
        sum(when(col("s") === 1, col("cap")).otherwise(0L)).over(all))
      .withColumn("rem", col("b") - col("sat_mass"))
      .withColumn("u", col("n") - col("n_sat"))
      .withColumn("r2", when(col("s") === 0,
        row_number().over(Window.partitionBy(col("s")).orderBy(col("source")))))
    val alloc = when(col("s") === 1, col("cap"))
      .otherwise(expr("rem div u") +
        when(col("r2") <= expr("rem % u"), 1L).otherwise(0L))
    m.withColumn("graft_alloc", alloc.cast("long"))
      .select(col("source"), col("cap").as("supply"),
        col("graft_alloc").as("alloc"),
        col("s").cast("long").as("saturated"),
        expr("graft_alloc * 1000 div cap").cast("long").as("fill_pm"))
      .orderBy(col("source"))
  }

  def all: Seq[Q] = Seq(q270)
}
