package graft

import org.apache.spark.sql.functions._

import graft.queries.{Json, Profile}
import graft.queries.Profile.ColSpec

/** Behavioral + plan-shape checks for the round-8 profiling tier
  * (q104–q109) — the oracle proves cross-engine agreement on the
  * synthetic corpus; these pin semantics on inputs the corpus doesn't
  * contain (malformed JSON payloads, hand-computable skewed
  * distributions, the n<5 quantile edge) and the plan shapes the
  * Scaladocs promise (one-scan profile, Expand-free approx form,
  * array-free outlier counting).
  */
class ProfilingSpec extends SparkSpec {

  // ---- q107: props extraction over malformed payloads ----

  test("q107 propsRollup counts broken/missing-key/wrong-type payloads as n_bad") {
    import spark.implicits._
    val events = Seq(
      // clean payload → bucket 42 % 10 = 2
      ("click", 1L, """{"k": 42}"""),
      // wrong type: "k" is a non-numeric string → field nulls out, counted bad
      ("click", 2L, """{"k": "notanumber"}"""),
      // broken JSON → whole struct nulls out, counted bad
      ("click", 3L, """{broken json"""),
      // well-formed but missing the key → counted bad
      ("view", 4L, """{"other": 1}"""),
      // NULL props: nothing to parse — NOT bad (props IS NULL guard)
      ("view", 5L, null: String),
      // clean payload → bucket 7
      ("view", 6L, """{"k": 7}"""))
      .toDF("event_type", "user_id", "props")
    val rows = Json.propsRollup(events).collect()
      .map(r => (r.getAs[String]("event_type"), Option(r.getAs[Any]("k_bucket"))) -> r)
      .toMap
    val clickOk = rows(("click", Some(2L)))
    assert(clickOk.getAs[Long]("n") == 1L && clickOk.getAs[Long]("n_bad") == 0L)
    assert(clickOk.getAs[Long]("min_k") == 42L && clickOk.getAs[Long]("max_k") == 42L)
    // users 2 (wrong type) and 3 (broken) land in the null bucket, both bad
    val clickBad = rows(("click", None))
    assert(clickBad.getAs[Long]("n") == 2L && clickBad.getAs[Long]("n_bad") == 2L)
    assert(clickBad.getAs[Long]("n_users") == 2L)
    // user 4 (missing key) is bad; user 5 (NULL props) is not
    val viewBad = rows(("view", None))
    assert(viewBad.getAs[Long]("n") == 2L && viewBad.getAs[Long]("n_bad") == 1L)
    val viewOk = rows(("view", Some(7L)))
    assert(viewOk.getAs[Long]("n") == 1L && viewOk.getAs[Long]("n_bad") == 0L)
  }

  test("q107 parses inside the scan stage: no shuffle before the rollup exchange") {
    // from_json with an explicit schema is a projection — exactly the
    // aggregate's own exchanges (the count_distinct two-phase pair +
    // the presentation sort's range exchange), never an inference or
    // re-read pass, and exactly one scan of events
    val df = run("q107_json_props")
    df.collect()
    val shuffleCount = shuffles(df).size
    assert(shuffleCount <= 3,
      s"q107 expected distinct-agg + sort exchanges only, got $shuffleCount")
    val scans = physicalNodes(df).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, s"q107 must parse in the one events scan, got ${scans.size}")
  }

  // ---- q106: one-scan column profile ----

  test("q106 exact profile: one scan, fact-sized stage stays a HashAggregate") {
    // Catalyst's own multi-distinct rewrite would put the string
    // min/max buffers on the expanded fact and fall back to a
    // SortAggregate that fully sorts it (measured 6.9 s vs sub-second
    // at sf0.1) — the cell-frame shape must keep every aggregate that
    // touches the scan hash-based; string buffers may only appear in
    // the keyless global fold over the compressed cells
    val df = run("q106_column_profile")
    df.collect()
    val nodes = physicalNodes(df)
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, s"q106 must profile every column in ONE scan, got ${scans.size}")
    assert(!planOf(df).contains("Expand"), "cell-frame shape must not use the Expand rewrite")
    val sortAggsOnFact = nodes.collect {
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec
          if a.collectLeaves().exists(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]) => a
    }
    assert(sortAggsOnFact.isEmpty,
      s"SortAggregate touches the fact scan — the k-expanded table would be sorted:\n${planOf(df)}")
  }

  test("q106 approx profile keeps one scan and drops the Expand") {
    val t = tables
    val specs = Seq(
      ColSpec("l_orderkey", col("l_orderkey")),
      ColSpec("l_suppkey", col("l_suppkey")),
      ColSpec("l_returnflag", col("l_returnflag")))
    val df = Profile.profile(t.lineitem, specs, exact = false)
    df.collect()
    val scans = physicalNodes(df).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, s"approx profile must stay one-scan, got ${scans.size}")
    assert(!planOf(df).contains("Expand"),
      "approx_count_distinct profile must be Expand-free (the 100 TB default)")
    // HLL cardinalities stay within the default-precision envelope of
    // the exact counts the oracle pins
    val exact = Profile.profile(t.lineitem, specs, exact = true).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    Profile.profile(t.lineitem, specs, exact = false).collect().foreach { r =>
      val (name, est) = (r.getAs[String]("col_name"), r.getAs[Long]("n_distinct"))
      assert(math.abs(est - exact(name)).toDouble / math.max(exact(name), 1L) < 0.15,
        s"$name: approx $est vs exact ${exact(name)} drifted past the HLL envelope")
    }
  }

  // ---- q109: compressed exact quantiles + fences ----

  test("q109 quantileFences matches hand-computed quantiles, fences, outliers") {
    import spark.implicits._
    val v = Seq(
      // group a: 1,2,3,4,100 → q1=2, med=3, q3=4, IQR=2, fences [-1, 7] → one outlier
      "a" -> 1L, "a" -> 2L, "a" -> 3L, "a" -> 4L, "a" -> 100L,
      // group b (n<5 edge, interpolation): 10,20 → q1=12.5, med=15, q3=17.5,
      // fences [5, 25] → none
      "b" -> 10L, "b" -> 20L,
      // group c (n=1): all quantiles = the value, fences degenerate, none
      "c" -> 7L,
      // group d (duplicate-heavy, exercises cell compression):
      // 1,1,1,1,5,5,99 → q1=1 (idx 1.5 brackets 1,1), med=1 (idx 3 exact),
      // q3=5 (idx 4.5 brackets 5,5), IQR=4, fences [-5, 11] → 99 is out
      "d" -> 1L, "d" -> 1L, "d" -> 1L, "d" -> 1L, "d" -> 5L, "d" -> 5L, "d" -> 99L)
      .toDF("g", "val")
    val r = Profile.quantileFences(v, "g", "val").collect()
      .map(x => x.getAs[String]("g") -> x).toMap
    def check(g: String, n: Long, q1: Double, med: Double, q3: Double,
        lo: Double, hi: Double, out: Long): Unit = {
      val row = r(g)
      assert(row.getAs[Long]("n") == n, s"$g n")
      assert(row.getAs[Double]("q1") == q1, s"$g q1=${row.getAs[Double]("q1")}")
      assert(row.getAs[Double]("median") == med, s"$g median")
      assert(row.getAs[Double]("q3") == q3, s"$g q3")
      assert(row.getAs[Double]("lo_fence") == lo, s"$g lo_fence")
      assert(row.getAs[Double]("hi_fence") == hi, s"$g hi_fence")
      assert(row.getAs[Long]("n_outliers") == out, s"$g n_outliers")
    }
    check("a", 5L, 2.0, 3.0, 4.0, -1.0, 7.0, 1L)
    check("b", 2L, 12.5, 15.0, 17.5, 5.0, 25.0, 0L)
    check("c", 1L, 7.0, 7.0, 7.0, 7.0, 7.0, 0L)
    check("d", 7L, 1.0, 1.0, 5.0, -5.0, 11.0, 1L)
  }

  test("q109 plan holds no per-group array: outliers count via broadcast re-aggregation") {
    val df = run("q109_quantile_compressed")
    df.collect()
    val plan = planOf(df)
    assert(!plan.contains("collect_list"),
      s"q109 must not materialize a per-group value histogram:\n$plan")
    assert(broadcasts(df).nonEmpty,
      "fence frame (one row per group) should broadcast back onto the cell frame")
  }

  // ---- q104/q105: set algebra + grouping sets ----

  test("q104 Venn regions are disjoint and cover the priority key sets") {
    import spark.implicits._
    val rows = run("q104_intersect_except").collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[String]("region")))
    // a key appears in exactly one region
    assert(rows.map(_._1).distinct.length == rows.length,
      "regions must partition the key space (no key in two regions)")
    val t = tables
    val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val high = t.orders.filter(col("o_orderpriority") === "2-HIGH")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val byRegion = rows.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSet }
    assert(byRegion.getOrElse("both", Set.empty) == (urgent & high))
    assert(byRegion.getOrElse("urgent_only", Set.empty) == (urgent -- high))
    assert(byRegion.getOrElse("high_only", Set.empty) == (high -- urgent))
  }

  test("q105 grouping sets emit exactly the three declared sets") {
    val rows = run("q105_grouping_sets").collect()
    val gids = rows.map(_.getAs[Long]("gid")).distinct.sorted
    // 0 = (priority, status), 2 = (status) with priority rolled away,
    // 3 = grand total — and NOT 1 (the (priority) set a cube would add)
    assert(gids.sameElements(Array(0L, 2L, 3L)), s"gids: ${gids.mkString(",")}")
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1)
    assert(grand(0).getAs[Long]("n") == tables.orders.count())
    // each status subtotal equals the sum of its detail rows
    val detailByStatus = rows.filter(_.getAs[Long]("gid") == 0L)
      .groupBy(_.getAs[String]("status")).view.mapValues(_.map(_.getAs[Long]("n")).sum)
    rows.filter(_.getAs[Long]("gid") == 2L).foreach { r =>
      assert(r.getAs[Long]("n") == detailByStatus(r.getAs[String]("status")),
        s"status ${r.getAs[String]("status")} subtotal mismatch")
    }
  }

  // ---- q108: point-in-time lookup ----

  test("q108 pre-history facts surface as NO_VERSION, never as a leaked current row") {
    val rows = run("q108_pit_lookup").collect()
    val noVersion = rows.filter(_.getAs[String]("segment") == "NO_VERSION")
    // the event spread is anchored pre-history (2023-12-02) so a slice
    // of every SF's orders must land before the dim existed
    assert(noVersion.nonEmpty, "expected a pre-history NO_VERSION group")
    assert(noVersion.forall(_.getAs[String]("row_status") == "none"),
      "a fact with no valid version must not inherit a version's row_status")
  }

  test("q108 lookup is the union-merge asof: no join node in the asof subplan") {
    // the q86 SCD2 MERGE legitimately plans a full-outer join; the
    // LOOKUP must not — a between-predicate join would cross each fact
    // row with its key's whole version chain first
    import spark.implicits._
    val facts = Seq((1L, 5L, 10.0), (1L, 1L, 20.0), (2L, 9L, 30.0))
      .toDF("k", "t", "amount")
    val vers = Seq((1L, 3L, "v1"), (1L, 7L, "v2")).toDF("k", "vt", "seg")
    val df = graft.operators.AsofJoin.backward(facts, vers,
      keyCol = "k", leftTimeCol = "t", rightTimeCol = "vt")
    val out = df.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[Long]("t")) -> Option(r.getAs[String]("seg"))).toMap
    assert(out((1L, 5L)) == Some("v1"), "t=5 sees the version opened at 3")
    assert(out((1L, 1L)) == None, "pre-history fact finds no version")
    assert(out((2L, 9L)) == None, "unknown key finds no version")
    val plan = planOf(df)
    assert(!plan.contains("Join"),
      s"asof lookup must be the union-merge (zero join nodes):\n$plan")
  }
}
