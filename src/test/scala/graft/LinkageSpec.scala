package graft

import org.apache.spark.sql.functions._

import graft.queries.{Concurrency, FuzzyMatch, KAnonymity}

/** Behavioral checks for the round-9 linkage/governance tier (q133
  * blocked fuzzy matching, q134 sweep-line concurrency, q135
  * k-anonymity) — the oracle proves cross-engine agreement on the
  * corpus; these pin semantics on crafted inputs: typo pairs and the
  * blocking trade, hand-built interval arrangements incl. the
  * half-open boundary, and a singleton-group privacy audit with its
  * generalization repair.
  */
class LinkageSpec extends SparkSpec {

  // ---- q133: blocked fuzzy matching ----

  test("q133 finds in-block typo pairs, gates on distance, misses cross-block") {
    import spark.implicits._
    val entities = Seq(
      "red bolt", "red bolt", "rad bolt",      // typo pair, dist 1, support 2/1
      "crimson bolt",                          // same block, dist > 3 from both
      "red bolts")                             // typo'd BLOCK → cross-block miss
      .map(Tuple1(_)).toDF("name")
    val pairs = FuzzyMatch.blockedPairs(entities, maxDist = 3).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b")) -> r).toMap
    assert(pairs.keySet == Set(("rad bolt", "red bolt")),
      s"expected exactly the typo pair, got ${pairs.keySet}")
    val p = pairs(("rad bolt", "red bolt"))
    assert(p.getAs[Long]("dist") == 1L)
    assert(p.getAs[Long]("support_a") == 1L && p.getAs[Long]("support_b") == 2L)
    // 'crimson bolt' is in-block but over the gate; 'red bolts' is
    // dist 1 from 'red bolt' yet invisible — the documented blocking trade
  }

  // ---- q134: sweep-line concurrency ----

  private def iv(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "us", "dur_us")
  }

  test("q134 peak concurrency: overlap, nesting, and the half-open boundary") {
    val out = Concurrency.userConcurrency(iv(Seq(
      // user 1: [0,10) and [5,15) overlap → peak 2
      (1L, 0L, 10L), (1L, 5L, 10L),
      // user 2: [0,10) then [10,20) touch but half-open → peak 1
      (2L, 0L, 10L), (2L, 10L, 10L),
      // user 3: [0,100) containing [10,20) and [30,40) → peak 2,
      // two overlapping starts
      (3L, 0L, 100L), (3L, 10L, 10L), (3L, 30L, 10L))))
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Long]("peak_concurrent") == 2L
      && out(1L).getAs[Long]("n_overlapping_starts") == 1L)
    assert(out(2L).getAs[Long]("peak_concurrent") == 1L
      && out(2L).getAs[Long]("n_overlapping_starts") == 0L)
    assert(out(3L).getAs[Long]("peak_concurrent") == 2L
      && out(3L).getAs[Long]("n_overlapping_starts") == 2L
      && out(3L).getAs[Long]("n_intervals") == 3L)
  }

  // ---- q135: k-anonymity audit ----

  test("q135 flags small quasi-groups and shows the generalization repair") {
    import spark.implicits._
    val people = Seq(
      (1L, "US"), (1L, "US"), (1L, "US"),   // (1, US): n=3, safe at k=3
      (2L, "US"),                           // (2, US): singleton → at risk
      (3L, "DE"), (3L, "DE"))               // (3, DE): n=2 → at risk
      .toDF("zip", "country")
    val rows = KAnonymity.audit(people, col("zip"), col("country"), k = 3).collect()
      .map(r => (r.getAs[String]("level"), r.getAs[String]("qa"),
        r.getAs[String]("qb")) -> r).toMap
    assert(!rows(("quasi", "1", "US")).getAs[Boolean]("at_risk"))
    assert(rows(("quasi", "2", "US")).getAs[Boolean]("at_risk"))
    assert(rows(("quasi", "3", "DE")).getAs[Boolean]("at_risk"))
    // generalizing zip away repairs US (n=4 ≥ 3) but not DE (n=2)
    val genUs = rows(("generalized", "ALL", "US"))
    assert(genUs.getAs[Long]("n") == 4L && !genUs.getAs[Boolean]("at_risk"))
    assert(rows(("generalized", "ALL", "DE")).getAs[Boolean]("at_risk"))
  }
}
