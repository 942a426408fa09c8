package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.{JaroWinkler, JaroWinklerImpl}
import graft.queries.JaroMatch

/** Differential + behavioral checks for the native Jaro-Winkler
  * expression (q152): 51 pairs pinned BIT-EXACTLY against DuckDB
  * `jaro_winkler_similarity` (textbook values + seeded random strings
  * over a 5-letter alphabet, generated offline), null/empty
  * semantics, codegen ≡ interpreted, SQL-registration parity, and
  * the q152 gate behavior on crafted entities.
  */
class JaroWinklerSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String)(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  // DuckDB jaro_winkler_similarity ground truth (seed 152).
  private val duckdb: Seq[(String, String, Double)] = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("arnab", "raanb", 0.8666666666666667),
    ("abcdefgh", "abcdzzzz", 0.6666666666666666),
    ("prefixxxxxxlong", "prefiyyyyylong", 0.8485714285714285),
    ("a", "a", 1.0),
    ("ab", "ba", 0.0),
    ("x", "y", 0.0),
    ("bdbaeaa", "aacdebdbbac", 0.6897546897546897),
    ("eaececdccbe", "daaaaaabd", 0.42424242424242414),
    ("cdbeabb", "c", 0.7428571428571429),
    ("daaccecebcea", "ccbdedcccae", 0.7146464646464646),
    ("bdbdbed", "ba", 0.5476190476190476),
    ("bbe", "dabeceda", 0.6388888888888888),
    ("ddaddbcdaa", "caadcebc", 0.4666666666666666),
    ("ace", "c", 0.0),
    ("aecdecdddebb", "cae", 0.6388888888888888),
    ("eecbbeab", "ebeeabc", 0.7821428571428571),
    ("cbbce", "dbcdbcdcbc", 0.65),
    ("cbabbdeacd", "dddc", 0.39999999999999997),
    ("adbb", "ddebcdb", 0.5952380952380952),
    ("cdad", "bedda", 0.6333333333333333),
    ("dcdb", "bca", 0.5277777777777778),
    ("ddaddbb", "bbcadbcab", 0.5886243386243386),
    ("ca", "bdbdcbbe", 0.0),
    ("daeaeebd", "abebecddba", 0.6416666666666667),
    ("aaeebbcbbce", "cbcbcbcbcaac", 0.5707070707070706),
    ("edacabb", "acbecdabc", 0.7301587301587301),
    ("dcdceadb", "aeabdbdcbbd", 0.6942640692640693),
    ("acedbd", "cabb", 0.6388888888888888),
    ("beed", "bdeeebcbd", 0.7583333333333333),
    ("bacddccbeb", "aeceaebcea", 0.6),
    ("cdebdcaee", "dbebd", 0.6648148148148149),
    ("dacd", "eacedb", 0.75),
    ("eeeecacb", "aaee", 0.5833333333333334),
    ("ccdcbd", "cbbbdb", 0.5555555555555555),
    ("bbadcceaa", "becc", 0.6944444444444443),
    ("dbb", "aabadadd", 0.4861111111111111),
    ("eed", "babcbbbceb", 0.0),
    ("eec", "ddc", 0.5555555555555555),
    ("bbddebb", "ccaabddcdb", 0.6571428571428571),
    ("bbcbbdbe", "bbec", 0.7666666666666667),
    ("ceeaeaccc", "dbdeebdd", 0.49074074074074076),
    ("aeede", "edbbee", 0.7388888888888889),
    ("c", "dcdacccdeecc", 0.6944444444444443),
    ("bae", "cecdaab", 0.4920634920634921),
    ("ad", "ecedecaccdc", 0.5303030303030303),
    ("eaeccebaddc", "d", 0.0))

  test("matches DuckDB jaro_winkler_similarity bit-exactly on 51 pinned pairs") {
    for ((a, b, expected) <- duckdb) {
      val got = JaroWinklerImpl.jwBytes(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      assert(got == expected, s"('$a','$b'): got $got expected $expected")
    }
  }

  test("symmetry and self-identity") {
    for ((a, b, _) <- duckdb.take(20)) {
      val ab = JaroWinklerImpl.jwBytes(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val ba = JaroWinklerImpl.jwBytes(b.getBytes("UTF-8"), a.getBytes("UTF-8"))
      assert(ab == ba, s"asymmetric on ('$a','$b')")
      assert(JaroWinklerImpl.jwBytes(a.getBytes("UTF-8"), a.getBytes("UTF-8")) == 1.0)
    }
  }

  test("empty strings score 0 (DuckDB convention), nulls propagate") {
    assert(JaroWinklerImpl.jwBytes(Array.emptyByteArray, Array.emptyByteArray) == 0.0)
    assert(JaroWinklerImpl.jwBytes("a".getBytes, Array.emptyByteArray) == 0.0)
    val out = df("a STRING, b STRING")(Seq(Row(null, "x"), Row("x", null), Row("", "")))
      .select(JaroWinkler(col("a"), col("b")).as("jw")).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("codegen column path agrees with the static impl") {
    val rows = duckdb.map { case (a, b, _) => Row(a, b) }
    val got = df("a STRING, b STRING")(rows)
      .select(col("a"), col("b"), JaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for ((a, b, expected) <- duckdb)
      assert(got((a, b)) == expected)
  }

  test("SQL-registered form agrees with the Column form") {
    SqlFunctions.registerAll(spark)
    val sql = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw").collect().head.getDouble(0)
    assert(sql == 0.9611111111111111)
  }

  test("q152 gate keeps the typo pair and drops the unrelated one") {
    val entities = df("name STRING")(Seq(
      Row("cold widget"), Row("old widget"), Row("red widget"),
      Row("cold widget"), // duplicate member
      Row("blue anvil")))
    val out = JaroMatch.blockedPairs(entities, 0.9).collect()
    val pairs = out.map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"))).toSet
    assert(pairs == Set(("cold widget", "old widget")))
    assert(out.head.getAs[Long]("support_a") == 2L) // dup counted as support
  }
}
