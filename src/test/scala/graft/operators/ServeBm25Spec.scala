package graft.operators

import graft.SparkTestBase

/** The served search face ([[Search.serveBm25]]): the stored BM25
  * index must reproduce the registry query bit-for-bit, both overloads
  * must agree, the artifact must be built once and reused, and the
  * partition-pruned path must agree with the distributed semi-join
  * fallback.
  */
class ServeBm25Spec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private val search = new Search(graft.config.Tuning.current)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq

  test("serveBm25 on the registry's pinned term set reproduces q85 bit-for-bit") {
    val q85 = new graft.QRegistry(graft.config.Tuning.current)
      .queries("q85_bm25_search")(spark, sf)
    val served = search.serveBm25(spark, sf, search.terms)
    assert(rows(served) == rows(q85))
  }

  test("Seq and DataFrame overloads agree; terms are lowercased on entry") {
    import spark.implicits._
    val viaSeq = search.serveBm25(spark, sf, Seq("spark", "stream"), k = 10)
    val viaDf = search.serveBm25(spark, sf,
      Seq("SPARK", "Stream", "spark", "", null.asInstanceOf[String])
        .toDF("tk"), k = 10)
    assert(rows(viaSeq) == rows(viaDf))
    assert(rows(viaSeq).nonEmpty)
  }

  test("the index is built once and reused across instances") {
    val before = Search.bm25Builds.get()
    search.serveBm25(spark, sf, Seq("spark")).collect()
    val after1 = Search.bm25Builds.get()
    // a SECOND instance (fresh per-instance ready-set) must find the
    // on-disk marker and reuse, not rebuild
    val other = new Search(graft.config.Tuning.current)
    other.serveBm25(spark, sf, Seq("window")).collect()
    assert(Search.bm25Builds.get() == after1)
    assert(after1 - before <= 1)
  }

  test("single-term head probes answer from the cache, bit-equal to the ranked path") {
    // the ranked path is forced by appending a matches-nothing filler
    // term: the pruned scan runs, and the real term's scores, order,
    // and n_terms are unchanged by a term with no postings
    for (term <- Seq("spark", "data", "the")) {
      val hot = search.serveBm25(spark, sf, Seq(term), k = 20)
      val ranked = search.serveBm25(spark, sf, Seq(term, "zz_no_such_term"), k = 20)
      assert(rows(hot) == rows(ranked), s"cache diverged for '$term'")
      assert(rows(hot).nonEmpty)
    }
    // an unknown term misses the cache and falls through cleanly
    assert(rows(search.serveBm25(spark, sf, Seq("zzqqx_unknown"), k = 5)).isEmpty)
    // k beyond the cache depth takes the ranked path
    val bigK = search.serveBm25(spark, sf, Seq("spark"), k = 300)
    val bigK2 = search.serveBm25(spark, sf, Seq("spark", "zz_no_such_term"), k = 300)
    assert(rows(bigK) == rows(bigK2))
  }

  test("an over-cap probe set takes the distributed path and agrees with the pruned path") {
    import spark.implicits._
    // force the fallback by exceeding the collect cap with filler terms
    // that match nothing; scores must equal the pruned path's
    val filler = (0 until 5000).map(i => s"zz_no_such_term_$i")
    val big = (search.terms ++ filler).toDF("tk")
    val pruned = search.serveBm25(spark, sf, search.terms)
    val fellBack = search.serveBm25(spark, sf, big)
    assert(rows(pruned) == rows(fellBack))
  }
}
