package graft.operators

import graft.SparkTestBase
import graft.config.Tuning

/** [[TextOps.surprisal]] — the unigram-LM quality scorer behind q100:
  * exact hand-computed values on a tiny corpus, the rare-token-dense >
  * common-token-dense ordering the filter exists for, and the
  * zero-token exclusion contract.
  */
class SurprisalSpec extends SparkTestBase {
  private val ops = new TextOps(Tuning())

  private def score(rows: Seq[(Long, String)]): Map[Long, Double] = {
    import spark.implicits._
    ops.surprisal(rows.toDF("doc_id", "text"))
      .as[(Long, Double)].collect().toMap
  }

  test("hand-computed values on a 4-token corpus") {
    // counts: a=3, b=1, total=4 → p(a)=.75, p(b)=.25
    val out = score(Seq((1L, "a a"), (2L, "a b")))
    assert(out(1L) == math.floor(-math.log(0.75) * 1e6 + 0.5) / 1e6)
    assert(out(2L) ==
      math.floor((-math.log(0.75) - math.log(0.25)) / 2 * 1e6 + 0.5) / 1e6)
  }

  test("rare-token-dense documents score above stopword-fluent ones") {
    val common = "the of and in a " * 8
    val out = score(Seq(
      (1L, common + "the of and in a"),
      (2L, common.trim),
      (3L, "zxqv kjhw pqrs mnbv wxyz")))
    assert(out(3L) > out(1L) && out(3L) > out(2L))
  }

  test("zero-token documents drop; case folds into the shared tokenizer") {
    val out = score(Seq((1L, ""), (2L, null.asInstanceOf[String]),
      (3L, "   "), (4L, "Word word WORD")))
    assert(out.keySet == Set(4L))
    assert(out(4L) == 0.0) // one token type: p=1, surprisal exactly 0
  }
}
