package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.queries.{DpRelease, NormalizedDedup, Winnowing}

/** q263–q266: winnowing fingerprint selection pinned against an
  * independent JVM brute-force implementation, the shared-passage
  * guarantee, containment classification on planted quote/wrapper
  * docs, canonicalization-dedup accounting, and the DP release's
  * threshold inversion re-derived with BigDecimal. (The oracle gate
  * proves DuckDB replays the plans; these pin the semantics.)
  */
class PartialDupSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val K = 5
  private val W = 8

  private def docs(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      rows.map { case (id, text) => Row(id, text) }.asJava,
      StructType.fromDDL("doc_id BIGINT, text STRING"))

  private def srcDocs(rows: Seq[(Long, String, String, String)]) =
    spark.createDataFrame(
      rows.map { case (id, text, lang, src) => Row(id, text, lang, src) }.asJava,
      StructType.fromDDL("doc_id BIGINT, text STRING, lang STRING, source STRING"))

  /** Independent winnowing: JVM md5, explicit per-window rightmost-min
    * scan — no lag/lead trick, no Spark.
    */
  private def bruteFingerprints(text: String): Set[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val w = text.split(" ", -1)
    if (w.length < K + W - 1 || w.length >= (1L << 20)) return Set.empty
    val hs = (0 to w.length - K).map { i =>
      val hex = md.digest(w.slice(i, i + K).mkString(" ").getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    (0 to hs.length - W).map { s =>
      val win = hs.slice(s, s + W)
      val m = win.min
      s + win.lastIndexOf(m) // rightmost minimal
    }.toSet.map((j: Int) => hs(j))
  }

  test("q263 selection matches brute-force winnowing on corpus docs") {
    val sample = tables.documents
      .filter("doc_id < 40").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Winnowing.fingerprints(docs(sample.toSeq.map(identity)))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(1)).toSet }
    sample.foreach { case (id, text) =>
      val want = bruteFingerprints(text)
      assert(got.getOrElse(id, Set.empty[Long]) === want,
        s"fingerprint mismatch for doc $id")
    }
    assert(got.values.map(_.size).sum > 0)
  }

  test("q263 shared-passage guarantee: a >=12-token shared run pairs") {
    val passage = (1 to 30).map(i => s"p$i").mkString(" ")
    val a = s"alpha one two three four five six seven $passage tail end bits"
    val b = s"$passage omega nine eight diff links mores stuff here now"
    val fa = bruteFingerprints(a)
    val fb = bruteFingerprints(b)
    assert(fa.intersect(fb).nonEmpty) // the winnowing theorem
    val out = Winnowing.overlap(docs(Seq(1L -> a, 2L -> b))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getLong(2) >= 3) // n_shared over the 30-token passage
    assert(r.getLong(5) > 0 && r.getLong(5) <= 1000)
  }

  test("q263 df-cap: corpus-wide identical fingerprints never pair") {
    // 40 byte-identical docs: every fingerprint has df 40 > cap 32, so
    // q263 emits nothing — that grain belongs to q40 exact dedup.
    val text = (1 to 30).map(i => s"b$i").mkString(" ")
    val rows = (1L to 40L).map(id => id -> text)
    assert(Winnowing.overlap(docs(rows)).collect().isEmpty)
  }

  test("q264 containment: quoted doc inside a wrapper is classified") {
    val quoted = (1 to 40).map(i => s"q$i").mkString(" ")
    val wrapper = s"header intro words around the block $quoted footer license " +
      ((1 to 30).map(i => s"f$i").mkString(" "))
    val out = Winnowing.containment(docs(Seq(10L -> quoted, 20L -> wrapper)))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 10L && r.getLong(1) === 20L) // inner = smaller set
    assert(r.getLong(5) >= 900, s"containment_pm ${r.getLong(5)}")
    assert(r.getLong(7) === 1L) // contained flag
    assert(r.getLong(6) < r.getLong(5)) // jaccard < containment: asymmetric
  }

  test("q264 ships no pair for disjoint docs") {
    val a = (1 to 30).map(i => s"x$i").mkString(" ")
    val b = (1 to 30).map(i => s"y$i").mkString(" ")
    assert(Winnowing.containment(docs(Seq(1L -> a, 2L -> b))).collect().isEmpty)
  }

  private def fullDocs(rows: Seq[(Long, String, String)]) =
    spark.createDataFrame(
      rows.map { case (id, text, src) =>
        Row(id, text, "en", src, text.length.toLong)
      }.asJava,
      StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"))

  test("q269 chains transitive passage overlaps into one family") {
    val p1 = (1 to 30).map(i => s"p$i").mkString(" ")
    val p2 = (1 to 30).map(i => s"q$i").mkString(" ")
    val a = s"one two three four five six seven eight $p1"
    val b = s"$p1 middle bridging tokens follow here now next $p2"
    val c = s"$p2 nine ten eleven twelve thirteen fourteen fifteen sixteen"
    val d = (1 to 30).map(i => s"z$i").mkString(" ") // isolated
    val out = Winnowing.families(fullDocs(Seq(
      (1L, a, "s1"), (2L, b, "s2"), (3L, c, "s2"), (4L, d, "s3"))))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L) // min-id family label
    assert(r.getLong(1) === 3L) // a, b, c — d stays out
    assert(r.getLong(2) === 2L) // sources s1, s2
    assert(r.getLong(3) === (a.length + b.length + c.length).toLong)
  }

  test("q265 canonicalization collapses case/punct and sees cross-source") {
    val out = NormalizedDedup.report(srcDocs(Seq(
      (1L, "Hello, World!", "en", "s1"),
      (2L, "hello   world", "en", "s1"),
      (3L, "hello world", "en", "s2"),
      (4L, "another doc entirely", "en", "s2")))).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // s1: 2 docs, 2 raw keys, 1 canonical key -> gain 1; shares it with s2
    assert(out("s1") === ((2L, 2L, 1L, 1L, 1L)))
    // s2: 2 docs, both distinct raw AND canonical; one key shared with s1
    assert(out("s2") === ((2L, 2L, 2L, 0L, 1L)))
  }

  test("q266 threshold table: shape, range, and median crossing") {
    val got = DpRelease.thresholdTable
    assert(got.size === 24)
    assert(got === got.sorted && got.distinct.size === 24) // strictly ascending
    assert(got.head > 0L && got.last < 4294967296L)
    // cdf(-1) < 1/2 < cdf(0): the mechanism is centered at zero
    assert(got(11) < (1L << 31) && got(12) > (1L << 31))
    // two-sided geometric symmetry: P(X <= -k-1) = P(X >= k+1), so
    // cdf(k) + cdf(-k-1) = 1 + 0 exactly; floors agree within 1 ulp
    (0 to 11).foreach { k =>
      val lhs = got(12 + k) + got(11 - k)
      assert(math.abs(lhs - 4294967296L) <= 2, s"symmetry at k=$k: $lhs")
    }
  }

  test("q266 noise inversion matches an independent JVM md5 draw") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(src: String, lang: String): Long = {
      val hex = md.digest(s"$src:$lang:graft_dp_v1".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val frame = srcDocs((1L to 9L).map(i =>
      (i, s"doc $i", if (i % 2 == 0) "en" else "de", s"s${i % 3}")))
    DpRelease.release(frame).collect().foreach { r =>
      val ref = -12L + DpRelease.thresholdTable
        .count(_ <= u32(r.getString(0), r.getString(1)))
      assert(r.getLong(3) === ref,
        s"noise mismatch for (${r.getString(0)}, ${r.getString(1)})")
    }
  }

  test("q266 noise bounds, determinism, and the zero clamp") {
    val out = DpRelease.release(srcDocs(Seq(
      (1L, "a", "en", "s1"), (2L, "b", "en", "s1"), (3L, "c", "de", "s2"))))
      .collect()
    assert(out.length === 2)
    out.foreach { r =>
      val (trueN, noise, released) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(noise >= -12 && noise <= 12)
      assert(released === math.max(0L, trueN + noise))
      assert(r.getLong(5) === 1000000L)
    }
    // keyed draws are deterministic: same frame, same release
    val again = DpRelease.release(srcDocs(Seq(
      (1L, "a", "en", "s1"), (2L, "b", "en", "s1"), (3L, "c", "de", "s2"))))
      .collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
