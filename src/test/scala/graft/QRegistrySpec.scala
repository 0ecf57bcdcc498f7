package graft

import graft.config.Tuning

/** Per-session knob threading: two [[QRegistry]] instances with
  * different [[Tuning]] sets must coexist in one JVM, each
  * self-consistent — its plans AND its oracle SQL interpolate the same
  * instance (the hash-check contract that [[Tuning.current]] used to
  * pin process-wide).
  */
class QRegistrySpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private val loose = new QRegistry(Tuning(nprobe = 2, sourceQuota = 5,
    annQueries = 3, lloydIters = 0))
  private val dense = new QRegistry(Tuning(nprobe = 16, sourceQuota = 20,
    annQueries = 10, lloydIters = 2))

  test("two registries in one JVM interpolate their own knobs into oracle SQL") {
    assert(loose.oracleSql("q59_source_quota_sample").contains("rn <= 5"))
    assert(dense.oracleSql("q59_source_quota_sample").contains("rn <= 20"))
    assert(loose.oracleSql("q44_ann_ivf_multiprobe").contains("rk <= 2"))
    assert(dense.oracleSql("q44_ann_ivf_multiprobe").contains("rk <= 16"))
    assert(loose.oracleSql("q40_ann_bruteforce").contains("vec_id < 3"))
    assert(dense.oracleSql("q40_ann_bruteforce").contains("vec_id < 10"))
  }

  test("registries execute with their own knobs side by side") {
    val lRows = loose.queries("q59_source_quota_sample")(spark, sf).collect()
    val dRows = dense.queries("q59_source_quota_sample")(spark, sf).collect()
    // per-source quota 5 vs 20: the loose registry keeps at most 5 docs
    // per source, the dense one strictly more overall on this data
    val lPerSource = lRows.groupBy(_.getAs[Any]("source")).map(_._2.length)
    assert(lPerSource.max <= 5)
    assert(dRows.length > lRows.length)
    val lAnn = loose.queries("q40_ann_bruteforce")(spark, sf).collect()
    val dAnn = dense.queries("q40_ann_bruteforce")(spark, sf).collect()
    assert(lAnn.map(_.getAs[Long]("q_id")).distinct.length == 3)
    assert(dAnn.map(_.getAs[Long]("q_id")).distinct.length == 10)
  }

  test("lloydIters=0 emits parseable IVF oracle SQL (no dangling comma)") {
    // the r5 ADVICE defect: the empty refinement chain rendered ",,"
    for (q <- Seq("q43_ann_ivf", "q44_ann_ivf_multiprobe", "q49_ivf_pq_search")) {
      val sql = loose.oracleSql(q)
      assert(!sql.contains(",,"), s"$q oracle has a dangling comma at lloydIters=0")
      // WITH clause must chain straight from cb0 to the final-assignment
      // CTEs without an empty element
      assert(sql.contains("cb0"))
    }
    // and the zero-iteration plan itself must run
    assert(loose.queries("q43_ann_ivf")(spark, sf).collect().nonEmpty)
  }

  test("default registry serves the driver contract") {
    assert(SparkEntry.queries.keySet == QRegistry.default.queries.keySet)
    assert(QRegistry.default.tuning == Tuning.current)
  }
}
