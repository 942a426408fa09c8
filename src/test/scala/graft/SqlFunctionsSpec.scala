package graft

import org.apache.spark.sql.functions._

/** SQL surface parity: every registered graft function must agree
  * with its Column-API twin (same expression class, so parity failure
  * means the registration/knob plumbing is wrong), plus closed-form
  * anchors and loud rejection of non-literal knobs.
  */
class SqlFunctionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    SqlFunctions.registerAll(spark)
  }

  test("graft_cosine matches the closed form and the Column API") {
    val r = spark.sql(
      "SELECT graft_cosine(array(3.0d, 4.0d), array(4.0d, 3.0d)) AS c")
      .collect()(0).getDouble(0)
    assert(r == 24.0 / 25.0) // (12+12)/(5*5), exact in doubles
    import spark.implicits._
    val df = Seq((Seq(0.5, -1.5, 2.0), Seq(1.0, 0.25, -0.75))).toDF("a", "b")
    df.createOrReplaceTempView("graft_sqlspec_v")
    val viaSql = spark.sql(
      "SELECT graft_cosine(a, b) AS c FROM graft_sqlspec_v").collect()(0).getDouble(0)
    val viaCol = df.select(graft.functions.vec.cosim(col("a"), col("b")).as("c"))
      .collect()(0).getDouble(0)
    assert(viaSql == viaCol)
  }

  test("sketch functions resolve from SQL and match the Column forms") {
    import spark.implicits._
    val docs = tables.documents.limit(20).select(col("doc_id"), col("text"))
    docs.createOrReplaceTempView("graft_sqlspec_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash64(split(text, ' ')) AS sh,
        |  graft_text_minhash(text, 5, 16) AS mh,
        |  graft_text_jaccard(text, text, 5) AS self_jac
        |FROM graft_sqlspec_docs""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Long](2), r.getDouble(3)))).toMap
    val viaCol = docs.select(col("doc_id"),
        graft.functions.sketch.simhash(split(col("text"), " ")).as("sh"),
        graft.functions.sketch.textMinhash(col("text"), 5, 16).as("mh"),
        graft.functions.sketch.textJaccard(col("text"), col("text"), 5).as("j"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Long](2), r.getDouble(3)))).toMap
    assert(viaSql == viaCol)
    viaSql.values.foreach { case (_, mh, selfJac) =>
      assert(mh.length == 16)
      assert(selfJac == 1.0)
    }
  }

  test("non-literal sketch knobs are rejected loudly") {
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_text_minhash('abc', cast(rand()*4 AS INT) + 1, 8)").collect()
    }
    assert(e.getMessage.contains("integer literal"),
      s"wrong error: ${e.getMessage}")
  }

  test("q122 SQL text and the Column form return identical frames") {
    val sqlRows = run("q122_sql_surface").collect()
    assert(sqlRows.nonEmpty)
    val t = tables
    val viaCol = t.documents.select(col("doc_id").as("doc_a"), col("text"))
      .join(t.documents.select((col("doc_id") - 1).as("doc_a"),
        col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_a")
      .select(col("doc_a"), col("doc_b"),
        round(graft.functions.sketch.textJaccard(col("text"), col("text_b"), 5), 4).as("jac5"))
      .orderBy(col("doc_a")).collect()
    assert(sqlRows.length == viaCol.length)
    sqlRows.zip(viaCol).foreach { case (s, c) =>
      assert(s.getLong(0) == c.getLong(0) && s.getDouble(2) == c.getDouble(2))
    }
  }
}
