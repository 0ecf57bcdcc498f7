package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._

/** The native NFC expression ([[NfcNormalize]]): decomposed sequences
  * compose, fixed points pass through, nulls stay null, the SQL
  * registration reaches the same expression, and non-string input
  * fails analysis loudly.
  */
class NfcNormalizeSpec extends SparkTestBase {

  private def nfc(c: org.apache.spark.sql.Column) =
    GraftShims.toColumn(NfcNormalize(GraftShims.toExpression(c)))

  test("decomposed sequences compose; fixed points pass through; null stays null") {
    import spark.implicits._
    val out = Seq(
      ("e\u0301", "\u00E9"),          // combining acute -> e-acute
      ("A\u030A", "\u00C5"),          // combining ring -> A-ring
      ("\u1100\u1161\u11A8", "\uAC01"), // decomposed jamo -> one syllable
      ("\u00E9", "\u00E9"),           // already NFC
      ("ascii", "ascii"),
      ("", ""),
      (null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("in", "want")
      .select(nfc($"in").as("got"), $"want")
      .as[(String, String)].collect()
    out.foreach { case (got, want) => assert(got == want) }
  }

  test("the SQL registration reaches the same expression") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT nfc_normalize('é') = 'é', " +
        "nfc_normalize(CAST(NULL AS STRING))")
      .collect()(0)
    assert(got.getBoolean(0))
    assert(got.isNullAt(1))
  }

  test("non-string input fails analysis with the expression's own error") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(nfc($"x")).collect()
    }
    assert(e.getMessage.contains("nfc_normalize requires STRING"))
  }
}
