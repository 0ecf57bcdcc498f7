package graft.config

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Config-compiler validation matrix — ports the intent of the
  * reference's tests/test_config.py (happy path, missing options,
  * no-timeout fallback, regex error matrix, group_by error matrix).
  */
class DeviceConfigSpec extends AnyFunSuite {

  val sonicConf = """
    |# sonic anemometer (reference configs/readport_4001.conf)
    |[device]
    |station = MSU
    |name = A3
    |host = 192.168.192.48
    |port = 4001
    |timeout = 120
    |[parser]
    |regex = ^x= *(?P<u>\S+) y= *(?P<v>\S+) z= *(?P<w>\S+) T= *(?P<temp>\S+).*$
    |pack_length = 12000
    |destination = ./data/
    |[logging]
    |level = INFO
    |file = readport_${device:port}.log
    |""".stripMargin

  val probeConf = """
    |[device]
    |station = MSU
    |name = M
    |host = localhost
    |port = 4004
    |[parser]
    |regex = ^(?P<level>\S+) RH= *(?P<rh>\S+) %RH T= *(?P<temp>\S+) .C\s*$
    |group_by = level:int
    |pack_length = 18
    |destination = ./data/
    |""".stripMargin

  test("happy path: sonic config loads with full field set") {
    val c = DeviceConfig.load(sonicConf)
    assert(c.station == "MSU" && c.device == "A3")
    assert(c.host == "192.168.192.48" && c.port == 4001)
    assert(c.timeoutSec.contains(120.0))
    assert(c.variables == Seq("u", "v", "w", "temp"))
    assert(c.groupBy.isEmpty)
    assert(c.packLength == 12000)
  }

  test("timeout is optional (reference: comment out to disable)") {
    val c = DeviceConfig.load(probeConf)
    assert(c.timeoutSec.isEmpty)
  }

  test("group_by parsed, typed, and schema compiles group key typed") {
    val c = DeviceConfig.load(probeConf)
    assert(c.groupBy.contains(GroupBy("level", "int")))
    val s = c.schema
    assert(s("level").dataType == LongType)
    assert(s("rh").dataType == DoubleType)
    assert(s("time").dataType == TimestampType)
    assert(s.fieldNames.last == "time")
  }

  test("extended interpolation ${device:port}") {
    val ini = DeviceConfig.parseIni(sonicConf)
    assert(ini("logging")("file") == "readport_4001.log")
  }

  test("interpolated value containing $ or \\ lands verbatim (not a template)") {
    val ini = DeviceConfig.parseIni("""
      |[parser]
      |regex = (?P<a>\S+) costs $5
      |[sink]
      |note = pattern is ${parser:regex} here
      |""".stripMargin)
    assert(ini("sink")("note") == """pattern is (?P<a>\S+) costs $5 here""")
  }

  test("max_messages_per_trigger parses and validates (X2 admission cap)") {
    val base = sonicConf.replace("[parser]",
      "max_messages_per_trigger = 5000\n[parser]")
    assert(DeviceConfig.load(base).maxPerTrigger == Some(5000L))
    assert(DeviceConfig.load(sonicConf).maxPerTrigger.isEmpty)
    val bad = sonicConf.replace("[parser]",
      "max_messages_per_trigger = lots\n[parser]")
    intercept[ConfigurationError](DeviceConfig.load(bad))
  }

  test("wal_max_segments parses and validates (WAL hygiene knob)") {
    val base = sonicConf.replace("[parser]",
      "wal_max_segments = 4\n[parser]")
    assert(DeviceConfig.load(base).walMaxSegments == Some(4))
    assert(DeviceConfig.load(sonicConf).walMaxSegments.isEmpty)
    val bad = sonicConf.replace("[parser]",
      "wal_max_segments = 0\n[parser]")
    intercept[ConfigurationError](DeviceConfig.load(bad))
  }

  test("missing required option → ConfigurationError") {
    val bad = sonicConf.replace("pack_length = 12000", "")
    val e = intercept[ConfigurationError](DeviceConfig.load(bad))
    assert(e.msg.contains("pack_length"))
  }

  test("invalid regex → ConfigurationError") {
    intercept[ConfigurationError](
      DeviceConfig.validateRegex("^(?P<u>[unclosed"))
  }

  test("unnamed capture group rejected (reference readport.py:610-611)") {
    val e = intercept[ConfigurationError](
      DeviceConfig.validateRegex(DeviceConfig.toJavaRegex("^(?P<u>\\S+) (\\S+)$")))
    assert(e.msg.contains("variable name"))
  }

  test("reserved variable 'time' rejected (reference readport.py:613-618)") {
    intercept[ConfigurationError](
      DeviceConfig.validateRegex(DeviceConfig.toJavaRegex("^(?P<time>\\S+)$")))
  }

  test("duplicate group names across alternation dialects are ONE variable") {
    val vars = DeviceConfig.validateRegex(DeviceConfig.toJavaRegex(
      "^(?P<u>\\S+) A$|^B (?P<u>\\S+)$"))
    assert(vars == Seq("u"))
  }

  test("group_by error matrix: bad format, bad type, unknown variable") {
    def withGroupBy(g: String) = probeConf.replace("group_by = level:int", s"group_by = $g")
    intercept[ConfigurationError](DeviceConfig.load(withGroupBy("level")))
    intercept[ConfigurationError](DeviceConfig.load(withGroupBy("level:bool")))
    intercept[ConfigurationError](DeviceConfig.load(withGroupBy("nosuch:int")))
  }

  test("filename template matches reference shape (readport.py:560-563)") {
    val c = DeviceConfig.load(probeConf)
    val stem = c.fileStem(Some(2), java.time.Instant.parse("2024-05-01T12:30:00Z"))
    assert(stem == "MSU_M2_2024-05-01_12-30-00")
  }
}
