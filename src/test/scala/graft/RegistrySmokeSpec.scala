package graft

/** The gate-shaped gate: EXECUTE every registered query against the REAL
  * driver testdata (sf0.001, noop sink — same forcing the bench uses, so
  * Catalyst can't prune the work away). Round 7 shipped 172 green
  * fixture-driven specs while nine registered queries crashed on the
  * actual testdata, because nothing in `sbt test` ran the registry
  * against `/root/testdata`. Now breaking any registered query breaks
  * the build — one test per query, so the failure names the query.
  */
class RegistrySmokeSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("every oracle-checked query has a registered spark side") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes on real testdata") {
      fn(spark, sf).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    }
  }
}
