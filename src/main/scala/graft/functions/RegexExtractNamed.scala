package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `regexp_extract_named(value, pattern)` — the engine's core projection
  * operator (reference P1, readport.py:328-369): ONE regex match per
  * record whose *named capture groups define the output schema*, returned
  * as a struct in a single pass.
  *
  * Semantics (matching the reference):
  *  - no match           → NULL struct (row becomes filterable, F1)
  *  - non-participating
  *    alternation group  → NULL field (readport.py:350-351)
  *  - sentinel `///`     → NULL field (readport.py:351; the reference
  *    *drops* the key — we keep fixed-width rows and null the cell,
  *    which also fixes its crash-on-inconsistent-keys edge,
  *    readport.py:259-262)
  *  - duplicate group names across alternation dialects fill ONE schema
  *    field (reference README.md:15 via the `regex` module; Java bans
  *    duplicates, so they are renamed at compile time and coalesced
  *    first-non-null at eval).
  *
  * Spark-first rationale: N× `regexp_extract` would re-run the match N
  * times per row; this expression restores the reference's single-pass
  * property. The compiled `Pattern` is reused across rows. Evaluation is
  * `CodegenFallback` — the regex engine dominates cost and sits between
  * two codegen'd stages without breaking them.
  */
case class RegexExtractNamed(child: Expression, pattern: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val norm = RegexExtractNamed.normalize(pattern)

  /** Group names in pattern order — the schema, as in the reference's
    * validate_regex (readport.py:587-620).
    */
  def groupNames: Seq[String] = norm.groups.map(_._1)

  @transient private lazy val compiled: Pattern =
    Pattern.compile(norm.javaPattern)

  /** ANALYSIS-time validation for every construction surface (SQL
    * registry, Scala Column API, config compiler): a malformed pattern
    * must fail the query with its real syntax error — not kill every
    * executor task at the lazy compile — and a pattern with no named
    * groups must not run as a silently empty struct. Compile is checked
    * FIRST so a syntax error isn't misreported as "no named groups".
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(
        s"regexp_extract_named requires STRING input, got ${child.dataType.catalogString}")
    else {
      try Pattern.compile(norm.javaPattern)
      catch {
        case e: java.util.regex.PatternSyntaxException =>
          return TypeCheckFailure(s"invalid pattern: ${e.getMessage}")
      }
      if (norm.groups.isEmpty)
        TypeCheckFailure("pattern has no named capture groups " +
          "((?P<name>...) or (?<name>...)): " + pattern)
      else TypeCheckSuccess
    }
  }

  override def dataType: DataType =
    StructType(groupNames.map(n => StructField(n, StringType, nullable = true)))

  /** Always nullable: a no-match returns a NULL struct even when the
    * input column is non-nullable (the socket source's `value` is).
    * UnaryExpression's default (child.nullable) would let codegen elide
    * the null check on downstream `_ex.field` access (NPE) and let the
    * optimizer constant-fold the F1 `IsNotNull(_ex)` drop-filter away.
    */
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val m: Matcher = compiled.matcher(input.toString)
    if (!m.lookingAt()) null  // anchored-at-start like Python's re.match
    else {
      val values = new Array[Any](norm.groups.length)
      var i = 0
      while (i < norm.groups.length) {
        val aliases = norm.groups(i)._2
        var g: String = null
        var j = 0
        while (g == null && j < aliases.length) {
          g = m.group(aliases(j)); j += 1
        }
        values(i) =
          if (g == null || g == RegexExtractNamed.Sentinel) null
          else UTF8String.fromString(g)
        i += 1
      }
      InternalRow.fromSeq(values.toIndexedSeq)
    }
  }

  override protected def withNewChildInternal(c: Expression): RegexExtractNamed =
    copy(child = c)
}

object RegexExtractNamed {
  /** Missing-value sentinel of the Vaisala-style MET station
    * (reference configs/readport_4004_KLDPIO.conf:19).
    */
  val Sentinel = "///"

  // group-open construct with a PYTHON-legal name (underscores allowed;
  // Java-illegal names get sanitized physical aliases in normalize)
  private val GroupName = "\\(\\?<([a-zA-Z_][a-zA-Z0-9_]*)>".r
  private val PyGroup = "\\(\\?P<([a-zA-Z_][a-zA-Z0-9_]*)>".r

  /** Python → Java group-open translation, `(?P<name>` → `(?<name>` —
    * applied ONLY to a complete group-open construct (the `>` after a
    * legal name is required), so `[(?P<]` character classes and
    * `\(?P<v=` literal fragments pass through untouched. Known limit:
    * a character class containing a COMPLETE group-open (`[(?P<a>]`) is
    * still rewritten — a pattern no realistic device regex contains and
    * the config compiler has always translated the same way. Shared by
    * [[normalize]] and the config compiler.
    */
  def toJavaDialect(pattern: String): String =
    PyGroup.replaceAllIn(pattern,
      m => scala.util.matching.Regex.quoteReplacement(s"(?<${m.group(1)}>"))

  /** A Java-compilable pattern plus, per logical variable, the (possibly
    * renamed) physical group aliases that can fill it.
    */
  final case class NormalizedPattern(
      javaPattern: String, groups: Seq[(String, Seq[String])])

  /** Make the pattern Java-compilable while keeping the LOGICAL schema
    * the user wrote:
    *  - Python `(?P<name>…)` group-opens translate to Java syntax
    *    ([[toJavaDialect]]);
    *  - names Java rejects (underscores — ubiquitous in migrated
    *    Python patterns) get sanitized PHYSICAL aliases, but the schema
    *    field keeps the original name;
    *  - duplicate names across alternation dialects are renamed
    *    (`(?<u>…)|(?<u>…)` → `(?<u>…)|(?<uDup1>…)`) with the alias sets
    *    remembered for first-non-null coalescing at eval.
    */
  def normalize(pattern0: String): NormalizedPattern = {
    val pattern = toJavaDialect(pattern0)
    val seen = scala.collection.mutable.Map[String, Int]()
    val used = scala.collection.mutable.Set[String]()
    val aliases = scala.collection.mutable.LinkedHashMap[String, Vector[String]]()
    val sb = new StringBuilder
    var last = 0
    for (m <- GroupName.findAllMatchIn(pattern)) {
      val name = m.group(1)
      // Java group names must be [a-zA-Z][a-zA-Z0-9]*
      val base = {
        val s = name.filter(_.isLetterOrDigit)
        if (s.nonEmpty && s.head.isLetter) s else "g" + s
      }
      val n = seen.getOrElse(name, 0)
      var cand = if (n == 0) base else s"${base}Dup$n"
      while (used.contains(cand)) cand = cand + "x"
      used += cand
      seen(name) = n + 1
      aliases(name) = aliases.getOrElse(name, Vector.empty) :+ cand
      sb.append(pattern.substring(last, m.start)).append(s"(?<$cand>")
      last = m.end
    }
    sb.append(pattern.substring(last))
    NormalizedPattern(sb.toString, aliases.toSeq)
  }


  /** Named capture groups in order of appearance (duplicates collapse to
    * one schema variable).
    */
  def groupNames(pattern: String): Seq[String] =
    normalize(pattern).groups.map(_._1)

  /** Column-level API: one match, N named groups, struct result. */
  def regexp_extract_named(c: Column, pattern: String): Column =
    GraftShims.toColumn(RegexExtractNamed(GraftShims.toExpression(c), pattern))
}
