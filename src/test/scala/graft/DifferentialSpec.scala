package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.operators.{AsofJoin, Components, RangeJoin, Sessionize, TopK}
import graft.functions.FrequentItemsWithTotal
import scala.util.Random

/** Fixed-seed randomized differential tests: each custom operator vs
  * an exhaustive in-memory reference implementation on random inputs
  * built to hit the adversarial shapes (duplicate keys, equal-time
  * ties, boundary-inclusive endpoints, self-loops, singleton and
  * empty groups). Seeds are pinned so any failure replays verbatim.
  * Complements the example-based OperatorsSpec: these sweep the input
  * space instead of probing known edges.
  */
class DifferentialSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // ---------------------------------------------------------------
  // AsofJoin.backward vs per-row scan
  // ---------------------------------------------------------------
  test("AsofJoin.backward matches the brute-force most-recent-state scan (3 seeds)") {
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      val nKeys = 5
      // dense small time domain -> plenty of exact left==right ties
      val left = (1L to 120L).map { lid =>
        Row(rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong, lid)
      }
      // right unique per (key, time) per the operator contract; a few
      // null times, which backward() must ignore entirely
      val rightKT = rnd.shuffle((for (k <- 0 until nKeys; t <- 0 until 40)
        yield (k.toLong, t.toLong)).toVector).take(70)
      val right = rightKT.zipWithIndex.map { case ((k, t), i) =>
        Row(k, t, 1000L + i)
      } ++ Seq(Row(0L, null, 9999L), Row(1L, null, 9998L))

      val out = AsofJoin.backward(
        df("k LONG, t LONG, lid LONG")(left),
        df("k LONG, rt LONG, v LONG")(right),
        "k", "t", "rt")
        .select("lid", "rt", "v").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

      val rmap = rightKT.zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }
        .groupBy(_._1)
      val expect = left.map { r =>
        val (k, t, lid) = (r.getLong(0), r.getLong(1), r.getLong(2))
        rmap.getOrElse(k, Vector.empty).filter(_._2 <= t) match {
          case v if v.isEmpty => (lid, None, None)
          case v =>
            val best = v.maxBy(_._2)
            (lid, Some(best._2), Some(best._3))
        }
      }.toSet
      assert(out == expect, s"asof mismatch at seed $seed")
    }
  }

  // ---------------------------------------------------------------
  // RangeJoin.pointInInterval vs all-pairs filter, invariant in width
  // ---------------------------------------------------------------
  test("RangeJoin.pointInInterval matches all-pairs containment for any bucket width") {
    val rnd = new Random(21)
    val points = (1L to 100L).map(pid => Row(rnd.nextInt(60).toLong, pid))
    val ivals = (1L to 40L).map { iid =>
      val s = rnd.nextInt(60).toLong
      Row(s, s + rnd.nextInt(15).toLong, iid)
    }
    val expect = (for {
      p <- points; i <- ivals
      if p.getLong(0) >= i.getLong(0) && p.getLong(0) <= i.getLong(1)
    } yield (p.getLong(1), i.getLong(2))).toSet
    // a correct bucketization is invariant in the width knob: tiny
    // widths multiply the right side, huge widths co-bucket everything
    for (width <- Seq(1L, 7L, 64L, 4096L)) {
      val out = RangeJoin.pointInInterval(
        df("p LONG, pid LONG")(points), "p",
        df("s LONG, e LONG, iid LONG")(ivals), "s", "e", width)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == expect, s"range join mismatch at width $width")
    }
  }

  // ---------------------------------------------------------------
  // Sessionize.byGap vs an in-memory walk
  // ---------------------------------------------------------------
  test("Sessionize.byGap matches the sequential gap walk (3 seeds)") {
    for (seed <- Seq(31, 32, 33)) {
      val rnd = new Random(seed)
      // coarse 10s grid -> duplicate timestamps exercise the tieBreak
      val events = (1L to 150L).map { id =>
        Row(rnd.nextInt(4).toLong,
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            rnd.nextInt(60).toLong * 10)), id)
      }
      val gap = 30L
      val out = Sessionize.byGap(
        df("u LONG, ts TIMESTAMP, id LONG")(events),
        col("u"), col("ts"), col("id"), gap)
        .select("u", "id", "session_seq").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

      val expect = events.groupBy(_.getLong(0)).flatMap { case (u, es) =>
        val sorted = es.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
        var seq = 0L
        var prev = Long.MinValue
        sorted.map { r =>
          val t = r.getTimestamp(1).getTime / 1000
          if (prev == Long.MinValue || t - prev > gap) seq += 1
          prev = t
          (u, r.getLong(2)) -> seq
        }
      }
      assert(out == expect, s"sessionize mismatch at seed $seed")
    }
  }

  // ---------------------------------------------------------------
  // Components.label vs union-find, min-label convention included
  // ---------------------------------------------------------------
  test("Components.label matches union-find partitions and the min-id label (3 seeds)") {
    for (seed <- Seq(41, 42, 43)) {
      val rnd = new Random(seed)
      val n = 30
      // duplicates, self-loops, and both orientations all legal input
      val edges = (1 to 45).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }
      import spark.implicits._
      val labels = Components.label(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // union-find ground truth over the touched nodes
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = nodes.groupBy(find)
      assert(labels.keySet == nodes.toSet, s"node set mismatch at seed $seed")
      byRoot.values.foreach { comp =>
        val ls = comp.map(labels).toSet
        assert(ls.size == 1, s"component split across labels at seed $seed: $comp -> $ls")
        assert(ls.head == comp.min,
          s"label ${ls.head} is not the component min ${comp.min} at seed $seed")
      }
    }
  }

  // ---------------------------------------------------------------
  // TopK.perGroup vs sort-and-take
  // ---------------------------------------------------------------
  test("TopK.perGroup matches per-group sort-and-take under a total order") {
    val rnd = new Random(51)
    // small value domain -> rank ties broken by id, groups of size 0..k..3k
    val rows = (1L to 200L).map { id =>
      Row(rnd.nextInt(12).toLong, rnd.nextInt(5).toLong, id)
    }
    val out = TopK.perGroup(df("g LONG, v LONG, id LONG")(rows),
      Seq(col("g")), Seq(col("v").desc, col("id")), k = 3)
      .select("g", "v", "id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expect = rows.groupBy(_.getLong(0)).flatMap { case (g, rs) =>
      rs.sortBy(r => (-r.getLong(1), r.getLong(2))).take(3).zipWithIndex
        .map { case (r, i) => (g, r.getLong(1), r.getLong(2), i + 1L) }
    }.toSet
    assert(out == expect)
  }

  // ---------------------------------------------------------------
  // SkewJoin.salted vs the plain equi-join
  // ---------------------------------------------------------------
  test("SkewJoin.salted equals the unsalted join on a skewed fixture, any salt count") {
    val rnd = new Random(55)
    // 80% of fact rows hit one hot key; dim includes duplicate keys
    // (join multiplicity must be preserved) and a key the fact never
    // touches (inner semantics)
    val fact = (1L to 300L).map { id =>
      Row(if (rnd.nextInt(5) > 0) 1L else 1L + rnd.nextInt(10).toLong, id)
    }
    val dim = ((1L to 10L).map(k => Row(k, s"d$k")) :+ Row(1L, "d1dup")) :+ Row(99L, "never")
    val factDf = df("k LONG, id LONG")(fact)
    val dimDf = df("dk LONG, name STRING")(dim)
    val expect = fact.flatMap { f =>
      dim.filter(_.getLong(0) == f.getLong(0))
        .map(d => (f.getLong(1), d.getString(1)))
    }.toSet
    for (numSalts <- Seq(1, 4, 16)) {
      val out = graft.operators.SkewJoin.salted(
        factDf, dimDf, "k", "dk", Seq(col("id")), numSalts)
        .select("id", "name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == expect, s"salted join diverged at numSalts=$numSalts")
    }
  }

  // ---------------------------------------------------------------
  // Misra–Gries: guarantee holds under arbitrary partition/merge trees
  // ---------------------------------------------------------------
  test("FrequentItemsWithTotal keeps the MG guarantee under random partition splits (5 seeds)") {
    val k = 8
    for (seed <- Seq(61, 62, 63, 64, 65)) {
      val rnd = new Random(seed)
      // zipf-ish: token i drawn with weight ~ 1/(i+1); a few heavy
      // hitters over a long tail of ~100 distinct items
      val stream = (1 to 2000).map { _ =>
        val r = rnd.nextDouble()
        val i = math.min((math.pow(100.0, r) - 1).toInt, 99)
        s"tok$i"
      }
      val truth = stream.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val agg = new FrequentItemsWithTotal(k)
      // random split into partitions, then a left-leaning merge tree —
      // exercises reduce and merge in mixed order like a real shuffle
      val parts = stream.grouped(1 + rnd.nextInt(400)).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      val (total, counters) = merged
      assert(total == stream.size.toLong, s"total miscounted at seed $seed")
      assert(counters.size <= k, s"more than $k counters at seed $seed")
      val bound = stream.size.toLong / (k + 1)
      truth.foreach { case (t, n) =>
        if (n > bound)
          assert(counters.contains(t),
            s"heavy hitter $t (count $n > $bound) missing at seed $seed")
      }
      counters.foreach { case (t, est) =>
        val n = truth.getOrElse(t, 0L)
        assert(est <= n && n - est <= bound,
          s"estimate $est for $t outside [truth-$bound, truth] (truth $n) at seed $seed")
      }
    }
  }

  // ---------------------------------------------------------------
  // det.dpercentile: bit-exact vs the same IEEE ops in plain Scala
  // ---------------------------------------------------------------
  test("det.dpercentile is bit-exact vs the in-memory interpolation (random arrays)") {
    val rnd = new Random(71)
    val cases = (1 to 20).map { _ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => rnd.nextDouble() * 1000).sorted
    }
    for (arr <- cases; f <- Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val out = spark.range(1).select(
        graft.functions.det.dpercentile(
          lit(arr.toArray), lit(arr.size), f).as("p"))
        .head.getDouble(0)
      val pos = f * (arr.size - 1)
      val lo = arr(math.floor(pos).toInt)
      val hi = arr(math.ceil(pos).toInt)
      val expect = lo + (hi - lo) * (pos - math.floor(pos))
      assert(java.lang.Double.doubleToLongBits(out) ==
        java.lang.Double.doubleToLongBits(expect),
        s"dpercentile($f) on n=${arr.size}: got $out expected $expect")
    }
  }

  test("PrefixSum.orderedRunningSum equals the sequential cumsum across partition counts") {
    import graft.operators.PrefixSum
    import spark.implicits._
    val rnd = new Random(171)
    // duplicate order keys are EXCLUDED by contract (total order
    // required); ids are unique, keys include negatives and repeats of
    // magnitude to stress range boundaries
    val rows = (1L to 400L).map(id => (id, rnd.nextInt(2000) - 500L))
    val expect = {
      var acc = 0L
      rows.sortBy(_._1).map { case (id, v) => acc += v; (id, acc) }.toMap
    }
    for (parts <- Seq(1, 3, 7, 32, 1000)) { // 1000 > rows: empty partitions
      val df = rows.toDF("id", "v").repartition(11) // scrambled physical layout
      val got = PrefixSum.orderedRunningSum(df, Seq(col("id")), col("v"), "run", parts)
        .select("id", "run").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, {
        val bad = expect.keys.filter(k => got.get(k) != expect.get(k)).take(5)
        s"parts=$parts diverged at ids $bad"
      })
      graft.CacheScope.releaseAll()
    }
  }

  test("q80's plan never collapses to a single-partition global window") {
    val df = run("q80_token_shards")
    import org.apache.spark.sql.execution.window.WindowExec
    val globals = physicalNodesWithCached(df).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty,
      s"unpartitioned WindowExec in the shard-packing plan:\n${globals.mkString("\n")}")
  }
}
