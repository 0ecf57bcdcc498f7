package graft.config

import java.util.regex.Pattern

import org.apache.spark.sql.types._

/** Configuration error — every reference config-validation failure
  * (reference readport.py:40, test_config.py) surfaces as this at load
  * time, never at runtime.
  */
final case class ConfigurationError(msg: String) extends Exception(msg)

/** The `group_by = name:type` clause (reference readport.py:166-231):
  * the only user-typed variable in the system — int, float or str.
  */
final case class GroupBy(name: String, dtype: String) {
  def sparkType: DataType = dtype match {
    case "int"   => LongType
    case "float" => DoubleType
    case "str"   => StringType
    case other   => throw ConfigurationError(
      s"Unknown group_by type '$other' (expected int, float or str)")
  }
}

/** Compiled per-device pipeline spec — the Spark twin of the reference's
  * INI config (reference readport.py:497-620, configs/readport_*.conf).
  *
  * The regex's named capture groups ARE the schema (readport.py:587-620);
  * every variable is float64 except the group key (readport.py:325-326);
  * `time` is reserved for the arrival timestamp (readport.py:613-618).
  */
final case class DeviceConfig(
    station: String,
    device: String,
    host: String,
    port: Int,
    timeoutSec: Option[Double],
    regex: String,            // Java-syntax, translated from (?P<name>…)
    variables: Seq[String],   // named groups, in order
    groupBy: Option[GroupBy],
    packLength: Int,
    destination: String,
    logLevel: Option[String] = None,   // [logging] level (readport.py:604-606)
    logFile: Option[String] = None,    // [logging] file, post-interpolation
    // X2 admission cap (the reference's bounded-queue backpressure,
    // readport.py:457-464): max messages admitted per micro-batch
    maxPerTrigger: Option[Long] = None,
    // WAL hygiene: live segments compact past this count (source option
    // walMaxSegments; None = the source default)
    walMaxSegments: Option[Int] = None) {

  /** DeviceConfig → StructType compiler (SURVEY.md §1.4): DoubleType
    * default, the group key keeps its configured type, plus the reserved
    * arrival-time column.
    */
  def schema: StructType = {
    val fields = variables.map { v =>
      val dt = groupBy match {
        case Some(g) if g.name == v => g.sparkType
        case _                      => DoubleType
      }
      StructField(v, dt, nullable = true)
    }
    StructType(fields :+ StructField("time", TimestampType, nullable = false))
  }

  /** Filename template of the persisted window (reference
    * readport.py:560-563): `{station}_{device}{group}_{date}`.
    */
  def fileStem(groupValue: Option[Any], date: java.time.Instant): String = {
    val g = groupValue.map(_.toString).getOrElse("")
    val d = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd_HH-mm-ss").withZone(java.time.ZoneOffset.UTC)
      .format(date)
    s"${station}_$device${g}_$d"
  }
}

object DeviceConfig {

  /** Python named group syntax → Java. The reference compiles
    * `(?P<name>…)` byte-regexes (readport.py:552); configs stay
    * compatible verbatim. ONE translation rule for the whole engine —
    * delegates to the expression's own dialect handling so the config
    * path and the SQL/Scala surfaces cannot drift.
    */
  def toJavaRegex(pyRegex: String): String =
    graft.functions.RegexExtractNamed.toJavaDialect(pyRegex)

  /** All validations of the reference's validate_regex + Group.validate
    * (readport.py:587-620, 211-230), as load-time errors:
    * regex must compile, every capture group must be named, `time` is
    * reserved, group_by must name a captured variable with a legal type.
    * Duplicate names across alternation dialects are legal (one schema
    * variable) — normalized via [[graft.functions.RegexExtractNamed]].
    */
  def validateRegex(javaRegex: String): Seq[String] = {
    val norm = graft.functions.RegexExtractNamed.normalize(javaRegex)
    val pattern =
      try Pattern.compile(norm.javaPattern)
      catch {
        case e: Exception =>
          throw ConfigurationError(s"Invalid regular expression: ${e.getMessage}")
      }
    val names = norm.groups.map(_._1)
    val aliasCount = norm.groups.map(_._2.size).sum
    if (aliasCount < pattern.matcher("").groupCount())
      throw ConfigurationError(
        "Every capture group must state a variable name, e.g. (?P<temp>...)")
    if (names.isEmpty)
      throw ConfigurationError("The regex must define at least one named group")
    if (names.contains("time"))
      throw ConfigurationError(
        "Variable name 'time' is reserved for the record timestamp")
    names
  }

  /** Parse the reference's INI dialect: `[section]`, `key = value`,
    * `#`/`;` comments, `${section:key}` extended interpolation.
    */
  def parseIni(text: String): Map[String, Map[String, String]] = {
    var section = ""
    val out = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, String]]()
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
          out.getOrElseUpdate(section, scala.collection.mutable.Map())
        } else line.indexOf('=') match {
          case -1 => throw ConfigurationError(s"Malformed config line: '$line'")
          case i =>
            if (section.isEmpty)
              throw ConfigurationError(s"Option outside any [section]: '$line'")
            out(section)(line.take(i).trim) = line.drop(i + 1).trim
        }
      }
    }
    val flat = out.map { case (s, kv) => s -> kv.toMap }.toMap
    // ${section:key} interpolation (configparser ExtendedInterpolation)
    val Interp = "\\$\\{([^:}]+):([^}]+)\\}".r
    flat.map { case (s, kv) =>
      s -> kv.map { case (k, v) =>
        // quoteReplacement: the looked-up value is data, not a
        // replacement template — a '$' or '\' in it (regex fragments,
        // Windows paths) must land verbatim
        k -> Interp.replaceAllIn(v, m =>
          scala.util.matching.Regex.quoteReplacement(
            flat.getOrElse(m.group(1), Map.empty).getOrElse(m.group(2),
              throw ConfigurationError(
                s"Unresolvable interpolation $${${m.group(1)}:${m.group(2)}}"))))
      }
    }
  }

  def load(text: String): DeviceConfig = {
    val ini = parseIni(text)
    def req(section: String, key: String): String =
      ini.getOrElse(section, Map.empty).getOrElse(key,
        throw ConfigurationError(s"Missing required option [$section] $key"))
    def opt(section: String, key: String): Option[String] =
      ini.getOrElse(section, Map.empty).get(key)

    val javaRegex = toJavaRegex(req("parser", "regex"))
    val variables = validateRegex(javaRegex)

    val groupBy = opt("parser", "group_by").map { spec =>
      spec.split(":") match {
        case Array(n, t) if Set("int", "float", "str")(t.trim) =>
          val g = GroupBy(n.trim, t.trim)
          if (!variables.contains(g.name))
            throw ConfigurationError(
              s"group_by variable '${g.name}' is not captured by the regex")
          g
        case _ => throw ConfigurationError(
          s"group_by must look like 'variable:type' with type int|float|str, got '$spec'")
      }
    }

    val packLength = req("parser", "pack_length").toIntOption
      .filter(_ > 0)
      .getOrElse(throw ConfigurationError("pack_length must be a positive integer"))

    DeviceConfig(
      station = req("device", "station"),
      device = req("device", "name"),
      host = req("device", "host"),
      port = req("device", "port").toIntOption.getOrElse(
        throw ConfigurationError("port must be an integer")),
      timeoutSec = opt("device", "timeout").map(t => t.toDoubleOption.getOrElse(
        throw ConfigurationError("timeout must be a number"))),
      regex = javaRegex,
      variables = variables,
      groupBy = groupBy,
      packLength = packLength,
      destination = req("parser", "destination"),
      logLevel = opt("logging", "level"),
      logFile = opt("logging", "file"),
      maxPerTrigger = opt("device", "max_messages_per_trigger").map(v =>
        v.toLongOption.filter(_ > 0).getOrElse(throw ConfigurationError(
          "max_messages_per_trigger must be a positive integer"))),
      walMaxSegments = opt("device", "wal_max_segments").map(v =>
        v.toIntOption.filter(_ > 0).getOrElse(throw ConfigurationError(
          "wal_max_segments must be a positive integer"))))
  }
}
