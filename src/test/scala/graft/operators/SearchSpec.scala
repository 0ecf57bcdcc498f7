package graft.operators

import graft.SparkTestBase

/** Semantic pins for the search tier beyond the DuckDB hash gate:
  * independent driver-side recomputes over the sf0.001 fixture.
  *
  * q85 is re-derived from the BM25 definition directly (tf/df maps, no
  * inverted index); q86 is checked against a DIFFERENT algorithm — a
  * quadratic longest-common-token-run DP per document pair — so a bug
  * in the positional-window/diagonal-island formulation can't hide by
  * being mirrored in the check.
  */
class SearchSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  private lazy val docs: Array[(Long, Array[String])] =
    graft.Tables.t(spark, sf, "documents").collect().map { r =>
      (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").toLowerCase.split("\\s+").filter(_.nonEmpty))
    }

  test("q85: BM25 top-20 matches a direct recompute from the definition") {
    val terms = Set("spark", "window", "hash", "stream")
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum.toDouble / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toDouble
      val s = terms.toSeq.sorted.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) None
        else Some(math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * tf * 2.2 /
          (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
      }
      if (s.isEmpty) None
      else Some((id, r4(s.sum), s.size.toLong))
    }.sortBy { case (id, sc, _) => (-sc, id) }.take(20).toSeq
    val got = graft.SparkEntry.queries("q85_bm25_search")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("bm25"), r.getAs[Long]("n_terms"))).toSeq
    assert(got == expected)
  }

  test("q86: reported runs match a quadratic longest-common-run DP") {
    val w = 8
    val minRun = graft.config.Tuning.current.runMinTokens
    val dfCap = graft.config.Tuning.current.dfCap
    // the check mirrors the operator's df-cap contract only to CONFIRM
    // it is inert on this fixture — past the cap the operator's output
    // is deliberately lossy and the DP equality below would not hold
    val dfByWin = docs.flatMap { case (id, toks) =>
      toks.sliding(w).filter(_.length == w).map(_.mkString(" ")).toSet.toSeq.map((x: String) => (x, id))
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.size }
    assert(dfByWin.values.forall(_ <= dfCap),
      "fixture saturates the df cap — this DP check no longer applies")

    // longest common CONSECUTIVE token run + aligned-window count, per
    // pair, by direct diagonal scan over the two token arrays
    def runsOf(a: Array[String], b: Array[String]): (Long, Long) = {
      var best = 0L
      var aligned = 0L
      for (diag <- -(b.length - 1) to (a.length - 1)) {
        var i = math.max(0, diag); var run = 0L
        while (i < a.length && (i - diag) < b.length) {
          if (a(i) == b(i - diag)) {
            run += 1
            if (run > best) best = run
            if (run >= w) aligned += 1
          } else run = 0L
          i += 1
        }
      }
      (best, aligned)
    }
    val expected = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (da, ta) = docs(i); (db, tb) = docs(j)
      if ta.length >= w && tb.length >= w
      (run, aligned) = if (da < db) runsOf(ta, tb) else runsOf(tb, ta)
      if run >= minRun
    } yield (math.min(da, db), math.max(da, db), run, aligned))
      .sortBy(t => (t._1, t._2)).toSeq
    val got = graft.SparkEntry.queries("q86_substring_runs")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("max_run_tokens"), r.getAs[Long]("n_aligned"))).toSeq
    assert(got.nonEmpty, "fixture has no exact-substring pairs — threshold too high to test")
    assert(got == expected)
  }

  test("q88 + stripRuns: stripped positions match a brute-force diagonal run scan") {
    val minRun = graft.config.Tuning.current.runMinTokens
    // independent coverage: for every pair and alignment diagonal, walk
    // maximal equal-token runs; a run of >= minRun tokens marks its
    // positions covered on BOTH sides
    val cov = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    def mark(id: Long, from: Long, until: Long): Unit = {
      val s = cov.getOrElseUpdate(id, scala.collection.mutable.Set[Long]())
      (from until until).foreach(s += _)
    }
    for {
      i <- docs.indices; j <- (i + 1) until docs.length
    } {
      val (ia, ib) = if (docs(i)._1 < docs(j)._1) (i, j) else (j, i)
      val (da, ta) = docs(ia); val (db, tb) = docs(ib)
      for (diag <- -(tb.length - 1) to (ta.length - 1)) {
        var p = math.max(0, diag); var runStart = p
        while (p <= ta.length && {
          val in = p < ta.length && (p - diag) < tb.length
          val eq = in && ta(p) == tb(p - diag)
          if (!eq) {
            if (p - runStart >= minRun) {
              mark(da, runStart, p); mark(db, runStart - diag, p - diag)
            }
            runStart = p + 1
          }
          in
        }) p += 1
      }
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byId = docs.toMap
    val expected = cov.toSeq.sortBy(_._1).map { case (id, ps) =>
      val toks = byId(id)
      val kept = toks.indices.filterNot(k => ps.contains(k.toLong)).map(toks)
      (id, toks.length.toLong, ps.size.toLong, md5hex(kept.mkString(" ")))
    }
    val got = graft.SparkEntry.queries("q88_boilerplate_strip")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[String]("stripped_hash"))).toSeq
    assert(got.nonEmpty, "fixture strips nothing — threshold too high to test")
    assert(got == expected)

    // and the composable operator returns the kept text for affected
    // docs, the verbatim original for the rest
    val search = new Search(graft.config.Tuning.current)
    val stripped = search.stripRuns(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val original = graft.Tables.t(spark, sf, "documents")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    original.foreach { case (id, text) =>
      cov.get(id) match {
        case Some(ps) =>
          val toks = byId(id)
          val kept = toks.indices.filterNot(k => ps.contains(k.toLong)).map(toks)
          assert(stripped(id) == kept.mkString(" "), s"doc $id stripped text")
        case None =>
          assert(stripped(id) == text, s"doc $id must be untouched")
      }
    }
  }
}
