package graft.operators

import graft.SparkTestBase
import graft.config.Tuning

/** The candidate-pair budget ([[graft.config.Tuning.verifyPairBudget]]):
  * when LSH candidate mass exceeds the budget, the exact-Jaccard verify
  * runs as deterministic hash-partitioned passes, each materialized
  * before the next starts — so a saturated corpus costs bounded extra
  * passes instead of one node-killing join. The contract this spec
  * locks: the budgeted passes are a pure PARTITION of the candidate
  * set, so every downstream consumer (q32 pairs, q38 components, q81
  * manifest) is bit-identical under any budget.
  */
class VerifyBudgetSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def results(t: Tuning, name: String): Seq[String] = {
    val q = new Dedup(t).all.find(_.name == name).get
    q.spark(spark, sf).collect().map(_.toString).toSeq
  }

  test("budgeted verify is bit-identical to the single pass (q32/q38)") {
    val base = Tuning()
    // budget of 3 pairs forces many passes even at sf0.001
    val tiny = base.copy(verifyPairBudget = 3)
    for (name <- Seq("q32_dedup_minhash_lsh", "q38_dedup_components")) {
      val one = results(base, name)
      val chunked = results(tiny, name)
      assert(one.nonEmpty, s"$name produced no rows — budget path untested")
      assert(chunked == one, s"$name differs under a 3-pair budget")
    }
  }
}
