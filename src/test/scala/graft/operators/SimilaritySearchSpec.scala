package graft.operators

import graft.SparkTestBase
import graft.config.Tuning

/** The vector store's SERVING path: [[Similarity#search]] answers
  * AD-HOC query vectors over the STORED index — assign against the
  * read codebook, candidates from the stored home cells, ADC ranking
  * over the stored codes, optional exact refine. No driver-contract
  * oracle (ad-hoc input), so the contract is pinned here: identity
  * recovery, brute-force agreement, and the no-build property.
  */
class SimilaritySearchSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private val sim = new Similarity(Tuning())

  private def corpus: Map[Long, Array[Float]] = {
    import spark.implicits._
    graft.Tables.t(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
  }

  test("a query equal to a corpus vector recovers that vector as its top hit") {
    val c = corpus
    // fresh ids so no self-exclusion anywhere can hide the identity
    val queries = Seq(100000L -> c(7L), 100001L -> c(42L))
    val rows = sim.search(spark, sf, queries, k = 3).collect()
    val top = rows.filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("n_id")).toMap
    assert(top(100000L) == 7L, s"identity query missed itself: $top")
    assert(top(100001L) == 42L, s"identity query missed itself: $top")
    // exact refine reports the exact cosine: identity pairs score 1.0
    rows.filter(_.getAs[Long]("rk") == 1L).foreach { r =>
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9)
    }
  }

  test("refined results agree with a driver-side brute force over the probed candidates") {
    val c = corpus
    val qv = c(13L)
    val res = sim.search(spark, sf, Seq(500000L -> qv), k = 5).collect()
    assert(res.length == 5)
    // every reported neighbor's cosine must match the exact driver-side
    // computation, and ranks must be cosine-descending
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    var prev = Double.MaxValue
    res.sortBy(_.getAs[Long]("rk")).foreach { r =>
      val expected = cos(qv, c(r.getAs[Long]("n_id")))
      val got = r.getAs[Double]("cosine")
      assert(math.abs(got - expected) < 1e-3,
        s"reported cosine $got vs exact $expected for ${r.getAs[Long]("n_id")}")
      assert(got <= prev + 1e-9, "ranks not cosine-descending")
      prev = got
    }
  }

  test("the ADC-only path returns k approximate hits without touching corpus floats") {
    val c = corpus
    val res = sim.search(spark, sf, Seq(1L -> c(3L)), k = 4, refine = false)
    val rows = res.collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[Double]("approx_d2") >= 0.0))
  }

  test("serving builds nothing: search over an existing index leaves indexBuilds unchanged") {
    sim.ensureIndex(spark, sf)
    val before = Similarity.indexBuilds.get()
    sim.search(spark, sf, Seq(9L -> corpus(9L)), k = 2).collect()
    assert(Similarity.indexBuilds.get() == before, "search rebuilt the index")
  }

  test("NULL and empty query vectors yield no rows, not a crash") {
    val res = sim.search(spark, sf,
      Seq(1L -> null, 2L -> Array.empty[Float]), k = 3).collect()
    assert(res.isEmpty)
  }
}
