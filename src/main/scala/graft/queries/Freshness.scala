package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q

/** q188: FEED FRESHNESS / COMPLETENESS audit — per event type, the
  * arrival-coverage ledger every ingestion monitor runs before
  * trusting a day's data: days present vs the corpus-wide observed
  * day spine, missing-day count, last-seen day, and staleness (days
  * since last arrival at the corpus frontier). The ABSENCE
  * complement of the suite's presence checks: q93 validates rows
  * that arrived, q101 fills gaps it is told about, q161 audits ID
  * continuity — this detects the feed that silently STOPPED (zero
  * rows is exactly what row-level rules never see).
  *
  * The day spine is the corpus's own observed day set (any type
  * reporting makes the day expected for every type) — no calendar
  * table needed and no assumption that the stream covers a fixed
  * range; a day NO feed delivered is genuinely ambiguous and is
  * excluded, documented.
  *
  * Scale shape: ONE distinct (type, day) exchange collapses the fact
  * (calendar × type bounded); the spine is a distinct-day projection
  * of that same frame (no second fact scan); the expected matrix
  * folds the group dim to a one-row array broadcast onto the day
  * frame and exploded (never a many×many cartesian — the
  * PlanHygiene rule); rollups are bounded. All integers and dates —
  * hash-exact.
  */
object Freshness {

  /** Coverage ledger per group over an observed-day spine. Factored
    * so the spec can pin a planted silent-stop (type present early,
    * absent at the frontier), the full-coverage zero row, and the
    * spine's any-type-defines-the-day rule.
    */
  def audit(presence: DataFrame, groupCol: String, dayCol: String): DataFrame = {
    val p = graft.CacheScope.trackedCache(
      presence.select(col(groupCol).as("graft_g"), col(dayCol).as("graft_d"))
        .distinct())
    val days = p.select(col("graft_d")).distinct()
    val frontier = days.agg(max(col("graft_d")).as("graft_maxd"))
    // expected matrix WITHOUT a many×many cartesian (PlanHygiene rule):
    // the group dim folds to a ONE-ROW array that broadcasts onto the
    // day frame and explodes — same bounded result, literal-frame BNLJ
    val groupArr = p.select(col("graft_g")).distinct()
      .agg(collect_list(col("graft_g")).as("graft_gs"))
    val expected = days.crossJoin(broadcast(groupArr))
      .select(explode(col("graft_gs")).as("graft_g"), col("graft_d"))
    expected
      .join(p.withColumn("graft_hit", lit(1L)), Seq("graft_g", "graft_d"), "left")
      .groupBy(col("graft_g"))
      .agg(
        count(lit(1)).as("n_days_expected"),
        count(col("graft_hit")).as("n_days_present"),
        (count(lit(1)) - count(col("graft_hit"))).as("n_days_missing"),
        max(when(col("graft_hit").isNotNull, col("graft_d"))).as("last_seen"))
      .crossJoin(broadcast(frontier))
      .select(
        col("graft_g").as(groupCol),
        col("n_days_expected"), col("n_days_present"), col("n_days_missing"),
        col("last_seen"),
        datediff(col("graft_maxd"), col("last_seen")).cast("long")
          .as("days_stale"))
  }

  val q188 = Q.of(
    "q188_freshness_audit",
    """WITH p AS (
      |  SELECT DISTINCT event_type AS g, CAST(ts AS DATE) AS d FROM events
      |), days AS (SELECT DISTINCT d FROM p),
      |groups AS (SELECT DISTINCT g FROM p),
      |frontier AS (SELECT MAX(d) AS maxd FROM days)
      |SELECT g AS event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_days_expected,
      |  CAST(COUNT(p.d) AS BIGINT) AS n_days_present,
      |  CAST(COUNT(*) - COUNT(p.d) AS BIGINT) AS n_days_missing,
      |  MAX(p.d) AS last_seen,
      |  CAST(date_diff('day', MAX(p.d), (SELECT maxd FROM frontier)) AS BIGINT)
      |    AS days_stale
      |FROM groups CROSS JOIN days
      |LEFT JOIN p USING (g, d)
      |GROUP BY g
      |ORDER BY event_type""".stripMargin) { t =>
    audit(
      t.events.select(col("event_type"), to_date(col("ts")).as("day")),
      "event_type", "day")
      .orderBy(col("event_type"))
  }

  def all: Seq[Q] = Seq(q188)
}
