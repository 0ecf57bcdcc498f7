package graft.functions

import graft.SparkTestBase

/** The SQL surface of the custom expressions: a pure-SQL user must be
  * able to call them after registration (live-session path here; the
  * spark.sql.extensions path shares the identical builder tuples via
  * graft.GraftExtensions).
  */
class GraftFunctionsSpec extends SparkTestBase {

  test("k_min_values is callable from SQL and matches the Scala API") {
    import spark.implicits._
    GraftFunctions.register(spark)
    (1L to 100L).map(i => (s"g${i % 2}", (i * 7919L) % 101L)).toDF("g", "v")
      .createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT g, k_min_values(v, 5) AS m FROM kmv_in GROUP BY g ORDER BY g")
      .as[(String, Array[Long])].collect().toSeq
    val viaApi = spark.table("kmv_in").groupBy($"g")
      .agg(KMinValues.kMinValues($"v", 5).as("m"))
      .orderBy($"g").as[(String, Array[Long])].collect().toSeq
    assert(viaSql.map(_._1) == viaApi.map(_._1))
    assert(viaSql.map(_._2.toSeq) == viaApi.map(_._2.toSeq))
    assert(viaSql.forall(_._2.length == 5))
  }

  test("regexp_extract_named is callable from SQL with named-group schema") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT regexp_extract_named('T= 21.5 RH= 40', 'T= (?P<temp>\\S+) RH= (?P<rh>\\S+)') AS ex""")
      .selectExpr("ex.temp", "ex.rh").head()
    assert(row.getString(0) == "21.5" && row.getString(1) == "40")
    // no match -> NULL struct, the F1 drop-filter contract
    assert(spark.sql(
      """SELECT regexp_extract_named('garbage', 'T= (?P<temp>\\S+)') IS NULL AS dropped""")
      .head().getBoolean(0))
  }

  test("underscore (Python-legal) group names work; schema keeps them") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT regexp_extract_named('T= 3', 'T= (?P<temp_c>\\S+)') AS ex""")
      .selectExpr("ex.temp_c").head()
    assert(row.getString(0) == "3")
  }

  test("a malformed or group-less pattern fails at ANALYSIS with the real cause") {
    GraftFunctions.register(spark)
    // no .collect(): Dataset construction runs analysis eagerly, so the
    // interceptions below prove analysis-time failure, not task-time
    val bad = intercept[Exception] {
      spark.sql("""SELECT regexp_extract_named('x', '[unclosed')""")
    }
    assert(bad.getMessage.contains("invalid pattern"),
      s"expected the regex syntax error, got: ${bad.getMessage}")
    val groupless = intercept[Exception] {
      spark.sql("""SELECT regexp_extract_named('x', 'T= \\d+')""")
    }
    assert(groupless.getMessage.contains("named capture group"))
    // the Scala Column API goes through the same expression check
    val viaApi = intercept[Exception] {
      spark.range(1).toDF("x")
        .select(RegexExtractNamed.regexp_extract_named(
          org.apache.spark.sql.functions.col("x").cast("string"), "no groups"))
    }
    assert(viaApi.getMessage.contains("named capture group"))
  }

  test("a non-literal pattern/k is a clear error, not a runtime crash") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT k_min_values(1L, CAST(rand() * 10 AS INT))").collect()
    }
    assert(e.getMessage.contains("k_min_values") ||
      e.getMessage.contains("INT LITERAL"))
  }

  test("GraftExtensions injects the same builders (extension-path smoke)") {
    // full spark.sql.extensions wiring needs a fresh session (config is
    // read at build time); here the injection call itself is exercised
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions()(ext)  // must not throw
  }
}
