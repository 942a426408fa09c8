package graft

import org.apache.spark.sql.functions._

import graft.queries.{SeqPattern, Winsorize}

/** Behavioral + plan-shape checks for the round-9 robustness tier
  * (q123 schema-drift union, q124 sequence-pattern matching, q125
  * winsorized stats) — the oracle proves cross-engine agreement on
  * the synthetic corpus; these pin semantics on inputs the corpus
  * doesn't contain (interleaved funnels, timestamp ties, crafted
  * distributions) and the plan shapes the Scaladocs promise
  * (shuffle-free union alignment, array-free approx winsorize).
  */
class RobustSpec extends SparkSpec {

  // ---- q123: schema-drift union ----

  test("q123 aligns by name: legacy rows surface as '<legacy>', never mis-bind") {
    val rows = run("q123_union_schema_drift").collect()
    val byPriority = rows.map(r => r.getAs[String]("priority") -> r).toMap
    assert(byPriority.contains("<legacy>"), "legacy generation must surface")
    // every orders row lands in exactly one bucket: total matches the table
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    assert(total == tables.orders.count())
  }

  test("q123 union alignment is a projection, not an exchange") {
    val df = run("q123_union_schema_drift")
    df.collect()
    // exchanges: the distinct-agg two-phase pair + the presentation
    // sort — the by-name alignment itself must not shuffle
    assert(shuffles(df).size <= 3,
      s"q123 union must align without shuffling, got ${shuffles(df).size} exchanges")
  }

  // ---- q124: sequence-pattern funnel ----

  private def seqDf(rows: Seq[(Long, String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  test("q124 counts Kleene-star funnels: clicks/errors between view and purchase") {
    val events = seqDf(Seq(
      // user 1: V C C P → one conversion through two clicks
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:01:00", 1L, "click"),
      (3L, "2024-01-01 10:02:00", 1L, "click"),
      (4L, "2024-01-01 10:03:00", 1L, "purchase"),
      // user 2: V S P — a signup interrupts the funnel → no conversion
      (5L, "2024-01-01 10:00:00", 2L, "view"),
      (6L, "2024-01-01 10:01:00", 2L, "signup"),
      (7L, "2024-01-01 10:02:00", 2L, "purchase"),
      // user 3: V P V E P — two complete funnels in one day
      (8L, "2024-01-01 10:00:00", 3L, "view"),
      (9L, "2024-01-01 10:01:00", 3L, "purchase"),
      (10L, "2024-01-01 10:02:00", 3L, "view"),
      (11L, "2024-01-01 10:03:00", 3L, "error"),
      (12L, "2024-01-01 10:04:00", 3L, "purchase")))
    val out = SeqPattern.daySequences(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[String]("seq") == "VCCP" && out(1L).getAs[Int]("n_conv") == 1)
    assert(out(2L).getAs[String]("seq") == "VSP" && out(2L).getAs[Int]("n_conv") == 0)
    assert(out(3L).getAs[String]("seq") == "VPVEP" && out(3L).getAs[Int]("n_conv") == 2)
  }

  test("q124 ties on ts break by event_id; day boundary splits the sequence") {
    val events = seqDf(Seq(
      // same-second tie: event_id order must decide V-before-P
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:00:00", 1L, "purchase"),
      // view on day 1, purchase on day 2 → no cross-day match
      (3L, "2024-01-02 23:59:00", 2L, "view"),
      (4L, "2024-01-03 00:01:00", 2L, "purchase")))
    val out = SeqPattern.daySequences(events).collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 1 && u1.head.getAs[String]("seq") == "VP"
      && u1.head.getAs[Int]("n_conv") == 1)
    val u2 = out.filter(_.getAs[Long]("user_id") == 2L).sortBy(_.getAs[java.sql.Date]("day").toString)
    assert(u2.length == 2, "day boundary must split into two sequences")
    assert(u2.forall(_.getAs[Int]("n_conv") == 0), "funnels must not match across days")
  }

  // ---- q125: winsorized stats ----

  test("q125 clamps into hand-computed fences and preserves row count") {
    import spark.implicits._
    // 21 values 0..20: p05 = 1.0, p95 = 19.0 exactly (pos = f·20 integral)
    val df = (0 to 20).map(v => ("a", v.toDouble)).toDF("g", "v")
    val out = Winsorize.winsorized(df, "g", "v", 0.05, 0.95).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n") == 21L)
    assert(r.getAs[Double]("p_lo") == 1.0 && r.getAs[Double]("p_hi") == 19.0)
    // winsorized sum: 0→1 and 20→19 clamped: (sum 0..20) − 0 + 1 − 20 + 19 = 210
    assert(math.abs(r.getAs[Double]("w_mean") - 210.0 / 21.0) < 1e-9)
    assert(r.getAs[Long]("n_clip_lo") == 1L && r.getAs[Long]("n_clip_hi") == 1L)
  }

  test("q125 approx form is array-free and lands near the exact fences") {
    import spark.implicits._
    val df = (0 to 1000).map(v => ("a", v.toDouble)).toDF("g", "v")
    val approx = Winsorize.winsorized(df, "g", "v", 0.05, 0.95, exact = false)
    assert(!planOf(approx).contains("collect_list"),
      "approx winsorize must not materialize a per-group array")
    val r = approx.collect().head
    // the sketch at accuracy 10000 on 1001 distinct values is exact-rank
    assert(math.abs(r.getAs[Double]("p_lo") - 50.0) <= 1.0)
    assert(math.abs(r.getAs[Double]("p_hi") - 950.0) <= 1.0)
  }
}
