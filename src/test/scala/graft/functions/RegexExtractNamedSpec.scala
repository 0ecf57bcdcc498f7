package graft.functions

import graft.SparkTestBase
import graft.functions.RegexExtractNamed.regexp_extract_named
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Extraction semantics matrix — ports the intent of the reference's
  * tests/test_parser.py extract cases (happy path, alternation with
  * non-participating groups, sentinel, cast errors handled downstream,
  * no-match).
  */
class RegexExtractNamedSpec extends SparkTestBase {
  import spark.implicits._

  private val sonic =
    """^x= *(?<u>\S+) y= *(?<v>\S+) z= *(?<w>\S+) T= *(?<temp>\S+).*$"""

  private def extract(msg: String, pattern: String): Row =
    Seq(msg).toDF("value")
      .select(regexp_extract_named($"value", pattern).as("ex"))
      .collect()(0).getStruct(0)

  test("happy path: sonic message fills all named groups (fixture A1)") {
    val r = extract("x= +000.079 y= -000.102 z= +000.095 T= +014.94 e1= 1", sonic)
    assert(r.getString(0) == "+000.079")
    assert(r.getString(3) == "+014.94")
  }

  test("no match → NULL struct (drop-malformed filter F1)") {
    val df = Seq("garbage", "x= 1 y= 2 z= 3 T= 4").toDF("value")
      .select(regexp_extract_named($"value", sonic).as("ex"))
    assert(df.filter($"ex".isNotNull).count() == 1)
  }

  test("/// sentinel → NULL field (fixture A5, readport.py:351)") {
    val r = extract("x= /// y= 2 z= 3 T= 4", sonic)
    assert(r.isNullAt(0) && r.getString(1) == "2")
  }

  test("anchored at start like re.match: suffix garbage ok, prefix not") {
    assert(extract("x= 1 y= 2 z= 3 T= 4 trailing", sonic) != null)
    val df = Seq("PREFIX x= 1 y= 2 z= 3 T= 4").toDF("value")
      .select(regexp_extract_named($"value", sonic).as("ex"))
    assert(df.filter($"ex".isNotNull).count() == 0)
  }

  test("alternation dialects with duplicate names fill one schema (A4 reversed order)") {
    val pat = graft.config.DeviceConfig.toJavaRegex(
      """^(?P<level>\S+) RH= *(?P<rh>\S+) %RH T= *(?P<temp>\S+) .C\s*$|^T= *(?P<temp>\S+) .C RH= *(?P<rh>\S+) %RH (?P<level>\S+)\s*$""")
    assert(RegexExtractNamed.groupNames(pat) == Seq("level", "rh", "temp"))
    val fwd = extract("01 RH= 1.23 %RH T= 14.94 'C ", pat)
    val rev = extract("T= 11.83 'C RH= 1.35 %RH 02 ", pat)
    assert(fwd.getString(0) == "01" && fwd.getString(1) == "1.23" && fwd.getString(2) == "14.94")
    assert(rev.getString(0) == "02" && rev.getString(1) == "1.35" && rev.getString(2) == "11.83")
  }

  test("gill CSV dialect with binary control chars (fixture A3)") {
    val pat = """^.+,(?<u>[^,]+),(?<v>[^,]+),(?<w>[^,]+),.,(?<temp>[^,]+),.+$"""
    val r = extract("Q,+000.079,-000.102,+000.095,M,+014.94,0000001,0F\r", pat)
    assert(r.getString(0) == "+000.079" && r.getString(3) == "+014.94")
  }

  test("downstream cast layer: bad value rows killed via try_cast guard") {
    // reference test_parser.py:62-72 — "ZZZ+000.079" fails float() and
    // kills the record
    val df = Seq("x= ZZZ1 y= 2 z= 3 T= 4", "x= 1 y= 2 z= 3 T= 4").toDF("value")
      .withColumn("ex", regexp_extract_named($"value", sonic))
      .filter($"ex".isNotNull)
      .withColumn("u", expr("try_cast(ex.u AS DOUBLE)"))
      .filter($"ex.u".isNull || $"u".isNotNull)
    assert(df.count() == 1)
  }
}
