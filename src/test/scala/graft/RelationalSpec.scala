package graft

/** Plan-shape assertions for the relational core — the properties that
  * make the queries scale-safe (SURVEY.md §5), asserted on the actual
  * executed plans: filters/projections reach the parquet scan,
  * dimension joins broadcast, window top-k gets partial
  * WindowGroupLimit, two-phase aggregation is present.
  */
class RelationalSpec extends SparkSpec {

  test("q01: filter and projection are pushed into the parquet scan") {
    val p = planOf(run("q01_agg_pushdown"))
    assert(p.contains("PushedFilters:"), "no pushed filters in scan")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"shipdate filter not pushed")
    assert(!p.contains("l_tax"), "ReadSchema not pruned: l_tax still read")
    assert(p.contains("HashAggregate"), "no hash aggregate")
  }

  test("q02: both dimension joins are broadcast, fact side never shuffles pre-agg") {
    val p = planOf(run("q02_join_broadcast"))
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).size
    assert(nBroadcast >= 2, s"expected >=2 BroadcastHashJoin, plan:\n$p")
    assert(!p.contains("SortMergeJoin"), "dim join degraded to SortMergeJoin")
  }

  test("q03: orders date filter is pushed to the scan") {
    val p = planOf(run("q03_multi_join_agg"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), "orderdate filter not pushed")
  }

  test("q05/q08: window top-k gets WindowGroupLimit (partial top-k before shuffle)") {
    assert(planOf(run("q05_window_rank")).contains("WindowGroupLimit"))
    assert(planOf(run("q08_topk_per_group")).contains("WindowGroupLimit"))
  }

  test("q39: the asOf parameter re-derives the pushed scan window at plan time") {
    // default registration pins 2000-12-31 -> hist window opens 1999-01-01;
    // a user-supplied asOf must re-plan the pushed literals, not share them
    val p = planOf(graft.queries.Churn.q39For("1999-06-30").run(spark, sfDir))
    assert(p.contains("1997-07-01") || p.contains("1997-06-30"),
      s"re-parameterized hist-window literal not pushed to the scan")
    assert(!p.contains("1999-01-01"),
      "plan still carries the default asOf's window literal")
    val pDefault = planOf(run("q39_churn_composition"))
    assert(pDefault.contains("1999-01-01"),
      "default asOf window literal missing from the pushed filters")
  }

  test("q46: one events exchange, dims broadcast, asOf re-plans the window literals") {
    val df = run("q46_engagement_funnel")
    df.collect() // finalize AQE so the real exchanges/joins are visible
    val p = planOf(df)
    assert(p.contains("In(event_type"), "event-type filter not pushed to the events scan")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, s"dims not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "a join degraded to SortMergeJoin")
    // the signup window min and the per-user aggregate must share ONE
    // exchange on user_id (q20's cascade shape) — the fact is never
    // re-shuffled or self-joined for the four reference LEFT JOINs
    val userExchanges = shuffles(df)
      .count(_.outputPartitioning.toString.contains("user_id"))
    assert(userExchanges == 1, s"expected 1 user_id exchange, got $userExchanges:\n$p")
    // re-parameterization: a new asOf re-derives the plan-time literals
    val p2 = planOf(graft.queries.Engagement.q46For(AsOf("2024-01-15"), 7).run(spark, sfDir))
    assert(p2.contains("2024-01-15") && p2.contains("2024-01-08"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("2024-01-31"), "plan still carries the default asOf literal")
  }

  test("q19/q20/q35/q36: asOf re-derives each window literal at plan time") {
    // (name, re-parameterized plan, literal the new asOf must produce,
    //  literal only the default registration carries)
    val cases = Seq(
      ("q19", planOf(graft.queries.Funnel.q19For(AsOf("1999-06-30"), 365).run(spark, sfDir)),
        "1998-06-30", "1997-01-01"),
      ("q20", planOf(graft.queries.Funnel.q20For(AsOf("2024-01-20"), 5).run(spark, sfDir)),
        "2024-01-15", "2024-01-10"),
      ("q35", planOf(graft.queries.Joins.q35For(AsOf("2024-01-10")).run(spark, sfDir)),
        "2024-01-10", "2024-01-16"),
      ("q36", planOf(graft.queries.Joins.q36For(AsOf("1997-12-31"), 365).run(spark, sfDir)),
        "1996-12-31", "1999-01-01"))
    for ((name, p, expectNew, defaultOnly) <- cases) {
      assert(p.contains(expectNew), s"$name: re-parameterized window literal not in plan")
      assert(!p.contains(defaultOnly), s"$name: plan still carries the default asOf literal")
    }
    assert(planOf(run("q19_date_buckets")).contains("1997-01-01"))
    assert(planOf(run("q20_funnel_cte")).contains("2024-01-10"))
    assert(planOf(run("q35_asof_join")).contains("2024-01-16"))
    assert(planOf(run("q36_range_join")).contains("1999-01-01"))
  }

  test("q47: fact window pushed to scan, dims broadcast, one fact exchange") {
    val df = run("q47_catalog_gap")
    df.collect() // finalize AQE
    val p = planOf(df)
    // the 730-day asOf window must reach the lineitem parquet scan
    assert(p.contains("GreaterThan(l_shipdate") || p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate window not pushed:\n$p")
    assert(!p.contains("SortMergeJoin"), "a dim join degraded to SortMergeJoin")
    // raw fact rows must never cross an exchange: every shuffle whose
    // subtree scans lineitem has to sit ABOVE a partial aggregate
    // (demand cells / supplier ranking) — a raw-fact shuffle here is
    // the pattern that dies at 100 TB
    val rawFactExchanges = shuffles(df).count { s =>
      val sub = s.child.toString
      sub.contains("lineitem") && !sub.contains("Aggregate")
    }
    assert(rawFactExchanges == 0,
      s"$rawFactExchanges exchange(s) ship un-aggregated lineitem rows:\n$p")
    // re-parameterization: a new asOf re-derives the pushed literals
    val p2 = planOf(graft.queries.CatalogGap.q47For(AsOf("2000-06-30")).run(spark, sfDir))
    assert(p2.contains("2000-06-30") && p2.contains("1998-07-01"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("2001-08-01"), "plan still carries the default asOf literal")
  }

  test("q48: fact window pushed, no raw-fact exchange, asOf re-plans") {
    val df = run("q48_seasonal_patterns")
    df.collect()
    val p = planOf(df)
    assert(p.contains("GreaterThan(l_shipdate") || p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate window not pushed:\n$p")
    assert(!p.contains("SortMergeJoin"), "a dim join degraded to SortMergeJoin")
    val rawFactExchanges = shuffles(df).count { s =>
      val sub = s.child.toString
      sub.contains("lineitem") && !sub.contains("Aggregate") && !sub.contains("Distinct")
    }
    assert(rawFactExchanges == 0,
      s"$rawFactExchanges exchange(s) ship un-aggregated lineitem rows:\n$p")
    val p2 = planOf(graft.queries.Seasonal.q48For(AsOf("2000-06-30")).run(spark, sfDir))
    assert(p2.contains("2000-06-30") && p2.contains("1998-07-01"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("2001-08-01"), "plan still carries the default asOf literal")
  }

  test("q49: one fused fact pass — window pushed, single (viewer, series) exchange, cells cached") {
    val df = run("q49_binge_behavior")
    df.collect()
    val p = planWithCachedOf(df)
    assert(p.contains("GreaterThan(l_shipdate") || p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate window not pushed:\n$p")
    assert(!p.contains("SortMergeJoin"), "a dim join degraded to SortMergeJoin")
    // the fused cell aggregate (binge metrics + series-minute partials
    // + first-view completion in one pass) is materialized once…
    assert(p.contains("InMemoryTableScan"), s"fused cell frame not cached:\n$p")
    // …and the LAG/row_number window partitions by (viewer, series)
    // with the cell groupBy reusing that partitioning — exactly one
    // exchange anywhere (cached plan included) carries fact-derived
    // rows on those keys; every other exchange is cell-sized
    val vsExchanges = physicalNodesWithCached(df).count {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        val part = s.outputPartitioning.toString
        part.contains("viewer") && part.contains("series")
      case _ => false
    }
    assert(vsExchanges == 1,
      s"expected 1 (viewer, series) exchange, got $vsExchanges:\n$p")
    val df2 = graft.queries.Binge.q49For(AsOf("2000-06-30"), 365).run(spark, sfDir)
    val p2 = planWithCachedOf(df2)
    assert(p2.contains("2000-06-30") && p2.contains("1999-07-01"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("2001-08-01"), "plan still carries the default asOf literal")
  }

  test("q55: interval join co-partitioned on user_id — no per-change reshuffle") {
    val df = run("q55_subscription_patterns")
    df.collect()
    val p = planOf(df)
    assert(p.contains("In(event_type") || p.contains("EqualTo(event_type"),
      "event-type filters not pushed to the events scans")
    // the fused per-change aggregate groups on (user_id, change_id, …):
    // the interval join's user_id partitioning satisfies it, so no
    // exchange anywhere re-partitions on change_id
    val changeExchanges = shuffles(df)
      .count(_.outputPartitioning.toString.contains("change_id"))
    assert(changeExchanges == 0,
      s"per-change reshuffle found ($changeExchanges change_id exchanges):\n$p")
    // the tiny predictor frame is what broadcasts into the target
    // band-join — the user frame must never be a broadcast build side
    assert(p.contains("BroadcastHashJoin"), s"target band-join not broadcast:\n$p")
    val p2 = planOf(graft.queries.Subscription.q55For(AsOf("2024-01-20"), 10).run(spark, sfDir))
    assert(p2.contains("2024-01-20") && p2.contains("2024-01-10"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("2024-01-28"), "plan still carries the default asOf literal")
  }

  test("q56: one events scan + one user_id exchange, genre and rate card broadcast") {
    val df = run("q56_user_ltv")
    df.collect()
    val p = planOf(df)
    assert(p.contains("In(event_type"), "event-type filter not pushed to the events scan")
    assert(!p.contains("SortMergeJoin"), "a dim join degraded to SortMergeJoin")
    // q46's cascade: the signup window min and the per-user aggregate
    // share ONE user_id hash exchange; the genre/part, customer/nation
    // and rate-card joins are all broadcast, so the fact never
    // re-shuffles (the final global sort is range partitioning and
    // legitimately carries user_id as its tiebreak key)
    val userExchanges = shuffles(df).count { s =>
      val part = s.outputPartitioning.toString
      part.contains("hashpartitioning") && part.contains("user_id")
    }
    assert(userExchanges == 1, s"expected 1 user_id hash exchange, got $userExchanges:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, s"dims not broadcast:\n$p")
    val p2 = planOf(graft.queries.Ltv.q56For(AsOf("2024-01-20"), 10).run(spark, sfDir))
    assert(p2.contains("2024-01-20") && p2.contains("2024-01-10"),
      "re-parameterized tenure literal not in the plan")
    assert(!p2.contains("2024-01-28"), "plan still carries the default asOf literal")
  }

  test("q57: pairwise self-join runs over the cached cell frame, fact window pushed") {
    val df = run("q57_geo_preferences")
    df.collect()
    val p = planWithCachedOf(df)
    assert(p.contains("GreaterThan(l_shipdate") || p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate window not pushed:\n$p")
    // the preference cell frame is cached once; the cross-country
    // self-join reads it from memory twice instead of re-deriving the
    // fact lineage for each side
    assert(p.contains("InMemoryTableScan"), s"cell frame not cached:\n$p")
    // the pair join and every final enrichment joins broadcast — the
    // pairwise comparison never shuffles; the one legitimate
    // sort-merge join is the (country × part) LeftAnti against the
    // viewed-pairs frame, whose both sides scale with |parts| (a
    // broadcast there would NOT survive a 100 TB corpus)
    val badSmj = physicalNodesWithCached(df).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.joinType != org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(badSmj.isEmpty, s"a small-frame join degraded to SortMergeJoin:\n$p")
    val p2 = planWithCachedOf(
      graft.queries.Geo.q57For(AsOf("1999-12-31"), 180).run(spark, sfDir))
    assert(p2.contains("1999-12-31") && p2.contains("1999-07-04"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("2000-12-31"), "plan still carries the default asOf literal")
  }

  test("q58: one fact exchange on content_id, dims broadcast, asOf re-plans the window") {
    val df = run("q58_cost_optimization")
    df.collect() // finalize AQE so the real exchanges/joins are visible
    val p = planOf(df)
    assert(p.contains("GreaterThan(l_shipdate"), s"shipdate window not pushed:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"part/supplier dims not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "a dim join degraded to SortMergeJoin")
    // the fact is shuffled exactly once, into the per-content aggregate;
    // the (type, genre, quality) rollup re-partitions only the
    // content-sized frame and the final sort is range partitioning
    val contentExchanges = shuffles(df).count { s =>
      val part = s.outputPartitioning.toString
      part.contains("l_partkey") || part.contains("content_id")
    }
    assert(contentExchanges == 1,
      s"expected 1 content-key exchange, got $contentExchanges:\n$p")
    val p2 = planOf(
      graft.queries.CostOpt.q58For(AsOf("1999-12-31"), 365).run(spark, sfDir))
    assert(p2.contains("1999-12-31") && p2.contains("1998-12-31"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("2000-12-31"), "plan still carries the default asOf literal")
  }

  test("q59: window min + both aggregates share ONE l_partkey exchange, asOf re-plans") {
    val df = run("q59_cohort_performance")
    df.collect() // finalize AQE so the real exchanges/joins are visible
    val p = planOf(df)
    assert(p.contains("LessThanOrEqual(l_shipdate"), s"asOf ceiling not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "the dim join degraded to SortMergeJoin")
    // the add-date window min, the (content, viewer) aggregate, and the
    // per-content aggregate all need only l_partkey clustering, so the
    // fact is exchanged exactly once; the only other hash exchange is
    // the cell-sized cohort rollup
    val factExchanges = shuffles(df)
      .count(_.outputPartitioning.toString.contains("l_partkey"))
    assert(factExchanges == 1,
      s"expected 1 l_partkey exchange, got $factExchanges:\n$p")
    val p2 = planOf(
      graft.queries.Cohort.q59For(AsOf("1995-12-31"), 365).run(spark, sfDir))
    assert(p2.contains("1995-12-31") && p2.contains("1994-12-31"),
      "re-parameterized cohort window literals not in the plan")
    assert(!p2.contains("1996-12-31"), "plan still carries the default asOf literal")
  }

  test("q62: one user_id exchange, customer broadcast, asOf re-plans the ts window") {
    val df = run("q62_cross_platform")
    df.collect() // finalize AQE so the real exchanges/joins are visible
    val p = planOf(df)
    assert(p.contains("GreaterThan(ts") || p.contains("ts#"),
      s"ts window not pushed to the events scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"customer dim not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "the dim join degraded to SortMergeJoin")
    // the per-user aggregate is the only fact exchange; the rollup
    // re-partitions the <=90-cell category frame
    val userExchanges = shuffles(df)
      .count(_.outputPartitioning.toString.contains("user_id"))
    assert(userExchanges == 1,
      s"expected 1 user_id exchange, got $userExchanges:\n$p")
    val p2 = planOf(
      graft.queries.CrossPlatform.q62For(AsOf("2024-01-20"), 10).run(spark, sfDir))
    assert(p2.contains("2024-01-20") && p2.contains("2024-01-10"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("2024-01-31"), "plan still carries the default asOf literal")
  }

  test("q63: affinity frame cached, fact scanned once, enrichments broadcast") {
    val df = run("q63_genre_affinity")
    df.collect()
    val p = planWithCachedOf(df)
    assert(p.contains("GreaterThan(l_shipdate"), s"shipdate window not pushed:\n$p")
    // the (profile, genre) affinity frame is cached once and reused by
    // the pair self-join (both sides), the qualifying-user counts, and
    // the exploded watched-content branch — the fact lineage exists
    // only inside the cached relation
    assert(p.contains("InMemoryTableScan"), s"affinity frame not cached:\n$p")
    val factScans = physicalNodesWithCached(df).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.tableIdentifier.isEmpty && s.toString.contains("lineitem") => s
    }
    assert(factScans.size == 1, s"expected 1 lineitem scan, got ${factScans.size}:\n$p")
    // the network frame is <=20 rows: every enrichment join broadcasts
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"enrichment joins not broadcast:\n$p")
    val p2 = planWithCachedOf(
      graft.queries.Affinity.q63For(AsOf("1996-06-30"), 60).run(spark, sfDir))
    assert(p2.contains("1996-06-30") && p2.contains("1996-05-01"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("1997-06-30"), "plan still carries the default asOf literal")
  }

  test("q64: type-pruned scans, rec aggregate reuses the join's user clustering") {
    val df = run("q64_recommendation_perf")
    df.collect()
    val p = planOf(df)
    assert(p.contains("EqualTo(event_type,click") || p.contains("event_type"),
      s"event_type filter not pushed:\n$p")
    // the rec and view branches each exchange ONCE on user_id for the
    // co-partitioned join; the per-recommendation aggregate groups by
    // (user_id, rec_id, ...) and must REUSE that clustering — a third
    // user exchange would mean the fused aggregate re-shuffled pairs
    // (at spec SF, AQE may broadcast the smaller join side, dropping
    // below 2 — what must NOT happen is a third exchange)
    val userExchanges = shuffles(df)
      .count(_.outputPartitioning.toString.contains("user_id"))
    assert(userExchanges <= 2,
      s"expected <=2 user_id exchanges (join sides only), got $userExchanges:\n$p")
    val p2 = planOf(
      graft.queries.Reco.q64For(AsOf("2024-01-20"), 10).run(spark, sfDir))
    assert(p2.contains("2024-01-20") && p2.contains("2024-01-10"),
      "re-parameterized rec window literals not in the plan")
    assert(!p2.contains("2024-01-31"), "plan still carries the default asOf literal")
  }

  test("q65: co-watch graph (no users-squared cross join), shared frame cached") {
    val df = run("q65_content_virality")
    df.collect()
    val p = planWithCachedOf(df)
    assert(p.contains("GreaterThan(l_shipdate"), s"shipdate window not pushed:\n$p")
    // the user network must come from the content-bucketed self-join of
    // the cached (user, content) frame — never a users x users cross join
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"network built via a cross join:\n$p")
    assert(p.contains("InMemoryTableScan"), s"(user, content) frame not cached:\n$p")
    val p2 = planWithCachedOf(
      graft.queries.Virality.q65For(AsOf("1996-06-30"), 180).run(spark, sfDir))
    assert(p2.contains("1996-06-30") && p2.contains("1996-01-02"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("1997-06-30"), "plan still carries the default asOf literal")
  }

  test("q66: the windowed cascade reuses one fam repartition across all levels") {
    val df = run("q66_family_usage")
    df.collect()
    val p = planOf(df)
    assert(p.contains("EqualTo(event_type,view") || p.contains("event_type"),
      s"event_type filter not pushed:\n$p")
    // the (fam, k, day) -> (fam, k) -> fam aggregate levels and the
    // genre-ranking window all require only fam clustering, so the
    // windowed branch exchanges exactly once on fam (the explicit
    // repartition); the roster branch exchanges once on (fam, prof)+fam
    val famOnly = shuffles(df).count { s =>
      val part = s.outputPartitioning.toString
      part.contains("fam") && !part.contains("prof")
    }
    assert(famOnly <= 2, s"cascade re-shuffled on fam, got $famOnly fam exchanges:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"customer/nation dims not broadcast:\n$p")
    val p2 = planOf(
      graft.queries.Family.q66For(AsOf("2024-01-20"), 10).run(spark, sfDir))
    assert(p2.contains("2024-01-20") && p2.contains("2024-01-10"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("2024-01-31"), "plan still carries the default asOf literal")
  }

  test("dimBroadcast: hints under the bound, degrades to a shuffle join above it") {
    // under the bound (every SF here): the hint is applied, so the
    // star join broadcasts even with auto-broadcast disabled
    assert(planOf(run("q14_pivot")).contains("BroadcastHashJoin"))
    assert(planOf(Registry.byName("q14_pivot").run(spark, "/root/testdata/sf0.1"))
      .contains("BroadcastHashJoin"), "hint missing at sf0.1 dim sizes")
    // forced-large dims (bound of 1 byte ≈ an sf100 customer table):
    // no hint; with runtime auto-broadcast also off, the join must
    // degrade to a shuffle join and still produce the same answer
    val expected = run("q14_pivot").collect().map(_.toString).sorted
    val auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(Dims.confKey, "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = run("q14_pivot")
      df.collect() // finalize AQE
      val p = planOf(df)
      assert(!p.contains("BroadcastHashJoin"),
        s"hint applied despite the 1-byte bound:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"no shuffle join in the degraded plan:\n$p")
      assert(df.collect().map(_.toString).sorted.sameElements(expected),
        "degraded plan changed the answer")
    } finally {
      spark.conf.unset(Dims.confKey)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto)
    }
  }

  test("q27: aggregation is two-phase (partial before the exchange)") {
    val p = planOf(run("q27_bucketed_groupby"))
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"no partial aggregate phase in plan:\n$p")
  }

  test("q30: text pipeline stays in WholeStageCodegen (no UDFs)") {
    val df = run("q30_token_count")
    df.collect() // finalize the AQE plan so codegen stages are visible
    val p = df.queryExecution.executedPlan.toString()
    // codegen stages print as "*(n) Operator" in the plan tree
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined,
      s"text projection fell out of codegen:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), "UDF in hot path")
  }

  test("q15/q16: EXISTS/NOT EXISTS plan as semi/anti hash joins") {
    val p15 = planOf(run("q15_semi_join"))
    assert(p15.contains("LeftSemi"), s"no semi join in plan:\n$p15")
    val p16 = planOf(run("q16_anti_join"))
    assert(p16.contains("LeftAnti"), s"no anti join in plan:\n$p16")
  }

  test("q21: sessionize window + session rollup share one exchange on user_id") {
    // window partitioned by user_id; groupBy(user_id, session_seq) is
    // satisfied by the same hash partitioning, so only ONE shuffle
    // (plus the final orderBy's range exchange) should exist
    val p = planOf(run("q21_sessionize"))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges <= 2, // initial + final formatted-plan double print
      s"expected 1 hash exchange (printed <=2x), got $hashExchanges:\n$p")
  }

  test("q29: left outer join preserves part side with the aggregate planned below it") {
    val df = run("q29_left_outer_join")
    val p = planOf(df)
    assert(p.contains("LeftOuter"), s"no left outer join in plan:\n$p")
    // the fact aggregate must run BELOW the join (aggregate-below-
    // outer-join: the join's right side is one slim row per partkey,
    // so the preserved dim side is never amplified)
    import org.apache.spark.sql.execution.joins.{BaseJoinExec}
    val joins = physicalNodes(df).collect {
      case j: BaseJoinExec if j.joinType.toString == "LeftOuter" => j
    }
    assert(joins.nonEmpty, s"no LeftOuter physical join:\n$p")
    val aggBelow = joins.exists(_.right.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.exists(_.groupingExpressions.exists(_.toString.contains("l_partkey"))))
    assert(aggBelow, s"lineitem aggregate not below the outer join:\n$p")
  }

  test("q67: one fact scan, benchmark cells broadcast, asOf re-plans the window") {
    val df = run("q67_competitive_benchmark")
    df.collect()
    val p = planWithCachedOf(df)
    assert(p.contains("GreaterThan(l_shipdate"), s"shipdate window not pushed:\n$p")
    // the per-content frame is cached and reused by the industry and
    // platform slices — the fact is scanned exactly once
    assert(p.contains("InMemoryTableScan"), s"per-content frame not cached:\n$p")
    val factScans = physicalNodesWithCached(df).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.tableIdentifier.isEmpty && s.toString.contains("lineitem") => s
    }
    assert(factScans.size == 1, s"expected 1 lineitem scan, got ${factScans.size}:\n$p")
    // benchmark cells (<=90 rows), genre-max arrays, and budget arrays
    // all broadcast onto the platform frame; part dim broadcast too
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"benchmark/enrichment joins not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"unexpected cross join:\n$p")
    val p2 = planOf(
      graft.queries.Competitive.q67For(AsOf("1996-06-30"), 180).run(spark, sfDir))
    assert(p2.contains("1996-06-30") && p2.contains("1996-01-02"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("1997-06-30"), "plan still carries the default asOf literal")
  }

  test("q68: one fact scan, one content exchange feeds attribution + break-even + bridge") {
    val df = run("q68_production_roi")
    df.collect()
    val p = planWithCachedOf(df)
    assert(p.contains("GreaterThan(l_shipdate"), s"shipdate window not pushed:\n$p")
    // the windowed viewing frame is cached once and fans out to the
    // per-(content, user) attribution aggregate, the per-content
    // roll-up, the per-day break-even cumsum, and the actor bridge —
    // the fact parquet is scanned exactly once
    assert(p.contains("InMemoryTableScan"), s"viewing frame not cached:\n$p")
    val factScans = physicalNodesWithCached(df).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.tableIdentifier.isEmpty && s.toString.contains("lineitem") => s
    }
    assert(factScans.size == 1, s"expected 1 lineitem scan, got ${factScans.size}:\n$p")
    // everything downstream of the added_date window rides ONE
    // content_id exchange (subset clustering): pcu/cp/pday/pcum/be/
    // bridge add no further fact-sized shuffle
    val contentExchanges = physicalNodesWithCached(df).collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if s.outputPartitioning.toString.contains("content_id") => s
    }
    assert(contentExchanges.size == 1,
      s"expected 1 content_id exchange, got ${contentExchanges.size}:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian product:\n$p")
    val p2 = planOf(
      graft.queries.Roi.q68For(AsOf("1996-06-30"), 180).run(spark, sfDir))
    assert(p2.contains("1996-06-30") && p2.contains("1996-01-02"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("1995-01-01"), "plan still carries the default asOf literal")
  }

  test("q69: type-pruned scans, impression aggregate reuses the join's user clustering") {
    val df = run("q69_personalization_effect")
    df.collect()
    val p = planWithCachedOf(df)
    assert(p.contains("event_type"), s"event_type filter not pushed:\n$p")
    // impression and view branches each exchange ONCE on user_id for
    // the co-partitioned LEFT join; the per-impression attribution
    // aggregate groups by (user_id, event_id, ...) and must REUSE that
    // clustering — a third user exchange would mean the fused
    // aggregate re-shuffled the pairs (q64's rule; AQE may broadcast
    // the smaller side at spec SF, dropping below 2)
    val userExchanges = physicalNodesWithCached(df).collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if s.outputPartitioning.toString.contains("user_id") => s
    }
    assert(userExchanges.size <= 2,
      s"expected <=2 user_id exchanges (join sides only), got ${userExchanges.size}:\n$p")
    // per-impression outcome frame is cached and reused by the
    // effectiveness cells and the v3.2 engagement-quality frame
    assert(p.contains("InMemoryTableScan"), s"outcome frame not cached:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian product:\n$p")
    val p2 = planOf(
      graft.queries.Personalization.q69For(AsOf("2024-01-20"), 10).run(spark, sfDir))
    assert(p2.contains("2024-01-20") && p2.contains("2024-01-10"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("2024-01-31"), "plan still carries the default asOf literal")
  }

  test("q74: view branch rides one user exchange through windows + per-user aggregate") {
    val df = run("q74_ab_test")
    df.collect()
    val p = planWithCachedOf(df)
    assert(p.contains("event_type"), s"event_type filter not pushed:\n$p")
    // the view branch computes the per-(user, content) first-view min,
    // the per-user lead gap, and the per-user metrics aggregate — all
    // on ONE user_id exchange (subset clustering); pop and purchase
    // branches add one each, and the 6-row statistical frame is cached
    val userExchanges = physicalNodesWithCached(df).collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if s.outputPartitioning.toString.contains("user_id") => s
    }
    assert(userExchanges.size <= 3,
      s"expected <=3 user_id exchanges (one per branch), got ${userExchanges.size}:\n$p")
    assert(p.contains("InMemoryTableScan"), s"statistical frame not cached:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian product:\n$p")
    val p2 = planOf(
      graft.queries.AbTest.q74For(AsOf("2024-01-21"), 10).run(spark, sfDir))
    assert(p2.contains("2024-01-21") && p2.contains("2024-01-11"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("2024-01-31"), "plan still carries the default asOf literal")
  }

  test("q75: one fact scan, bridge rank rides the content clustering, history broadcast") {
    val df = run("q75_predictive_features")
    df.collect()
    val p = planWithCachedOf(df)
    assert(p.contains("GreaterThan(l_shipdate"), s"shipdate window not pushed:\n$p")
    // the cached viewing frame feeds the per-content roll-up, the
    // top-3 actor bridge (rank window on the same content clustering),
    // and the genre-year history tag join — one fact parquet scan
    assert(p.contains("InMemoryTableScan"), s"viewing frame not cached:\n$p")
    val factScans = physicalNodesWithCached(df).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.tableIdentifier.isEmpty && s.toString.contains("lineitem") => s
    }
    assert(factScans.size == 1, s"expected 1 lineitem scan, got ${factScans.size}:\n$p")
    // the actor co-occurrence self-join must be an equi-join on
    // actor_id over the capped (content, actor) bridge — never a
    // contents-squared cross join
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"actor pair generation degraded to a cross join:\n$p")
    val p2 = planOf(
      graft.queries.Predictive.q75For(AsOf("1996-12-31"), 365).run(spark, sfDir))
    assert(p2.contains("1996-12-31") && p2.contains("1996-01-01"),
      "re-parameterized window literals not in the plan")
    assert(!p2.contains("1997-06-30"), "plan still carries the default asOf literal")
  }

  test("q50: query set is broadcast, candidates never shuffle before top-k") {
    val p = planOf(run("q50_ann_bruteforce"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"), "top-k missing WindowGroupLimit")
  }

  test("every registered query returns rows on sf0.001") {
    for (q <- Registry.all) {
      val n = q.run(spark, sfDir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
