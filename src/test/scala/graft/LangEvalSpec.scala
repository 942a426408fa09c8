package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.LangEval

/** q218 confusion matrix: hand-built tp/fp/fn accounting including an
  * out-of-range declared label, the zero-class NULL guards, and the
  * exact macro-F1 arithmetic.
  */
class LangEvalSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def run(rows: Seq[(String, String)]) =
    LangEval.confusion(
      spark.createDataFrame(
        rows.map { case (d, p) => Row(d, p) }.asJava,
        StructType.fromDDL("declared STRING, predicted STRING")),
      col("declared"), col("predicted"))
      .collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          Option(r.get(r.fieldIndex("f1"))).map(_.asInstanceOf[Double]),
          r.getAs[Double]("macro_f1"))))
      .toMap

  test("q218 hand-built matrix: tp/fp/fn, F1, and macro are exact") {
    val rows = Seq(
      ("en", "en"), ("en", "en"), ("en", "en"), ("en", "de"),
      ("de", "de"), ("de", "de"),
      ("zh", "en")) // out-of-range declared label counts as en fp
    val out = run(rows)
    assert(out("en")._1 == 3L && out("en")._2 == 1L && out("en")._3 == 1L)
    assert(out("en")._4.contains(0.75))
    assert(out("de")._1 == 2L && out("de")._2 == 1L && out("de")._3 == 0L)
    // p = 2/3, r = 1 -> f1 quantizes to 0.8 in the macro; raw is IEEE
    assert(math.abs(out("de")._4.get - 0.8) < 1e-12)
    // es/fr never appear: all-zero classes guard F1 to NULL
    assert(out("es")._4.isEmpty && out("fr")._4.isEmpty)
    assert(out("es")._1 == 0L && out("fr")._3 == 0L)
    // macro over the two non-null classes: (0.75 + 0.8) / 2
    assert(out("en")._5 == 0.775)
    assert(out.values.map(_._5).toSet.size == 1)
  }

  test("q218 perfect classifier: F1 = 1 everywhere it predicts, macro 1") {
    val rows = Seq(("en", "en"), ("de", "de"), ("es", "es"), ("fr", "fr"))
    val out = run(rows)
    Seq("en", "de", "es", "fr").foreach { c =>
      assert(out(c)._4.contains(1.0), s"$c ${out(c)}")
    }
    assert(out("en")._5 == 1.0)
  }
}
