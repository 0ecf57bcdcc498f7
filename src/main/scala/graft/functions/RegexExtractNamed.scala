package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftShims
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
  *
  * Spark-first rationale: N× `regexp_extract` would re-run the match N
  * times per row; this expression restores the reference's single-pass
  * property. The compiled `Pattern` is reused per-task. Evaluation is
  * `CodegenFallback` for now — the regex match dominates cost, and the
  * expression sits between two codegen'd stages without breaking them.
  */
case class RegexExtractNamed(child: Expression, pattern: String)
    extends UnaryExpression with CodegenFallback {

  /** Group names in pattern order — the schema, as in the reference's
    * validate_regex (readport.py:587-620).
    */
  lazy val groupNames: Seq[String] = RegexExtractNamed.groupNames(pattern)

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  override def dataType: DataType =
    StructType(groupNames.map(n => StructField(n, StringType, nullable = true)))

  override def nullSafeEval(input: Any): Any = {
    val m: Matcher = compiled.matcher(input.toString)
    if (!m.lookingAt()) null  // anchored-at-start like re.match
    else {
      val values = new Array[Any](groupNames.length)
      var i = 0
      while (i < groupNames.length) {
        val g = m.group(groupNames(i))
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

  private val GroupName = "\\(\\?<([a-zA-Z][a-zA-Z0-9]*)>".r

  /** Named capture groups in order of appearance (duplicates collapse to
    * first occurrence — alternation dialects share one schema, reference
    * README.md:15).
    */
  def groupNames(pattern: String): Seq[String] =
    GroupName.findAllMatchIn(pattern).map(_.group(1)).toSeq.distinct

  /** Column-level API: one match, N named groups, struct result. */
  def regexp_extract_named(c: Column, pattern: String): Column =
    GraftShims.toColumn(RegexExtractNamed(GraftShims.toExpression(c), pattern))
}
