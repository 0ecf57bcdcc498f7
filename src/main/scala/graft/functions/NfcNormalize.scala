package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15) as a native Catalyst expression
  * — the standard pre-tokenization stage of a text pipeline: visually
  * identical strings with different code-point sequences ("é" composed
  * vs "e" + U+0301) must fingerprint, deduplicate, and tokenize
  * identically, so normalization runs BEFORE q30/q53's hashing and the
  * BPE surfaces. Spark has no built-in; a native expression with real
  * codegen keeps it inside whole-stage codegen where a Scala UDF would
  * break the span. DuckDB's `nfc_normalize` implements the same UAX
  * #15 NFC, which is what makes q92's oracle byte-exact — the
  * SQL-callable name matches deliberately.
  *
  * Already-normalized inputs (the overwhelmingly common case — ASCII
  * is always NFC) return the INPUT UTF8String without copying;
  * `isNormalized` is a cheap quick-check-driven scan.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(
        s"nfc_normalize requires STRING input, got ${child.dataType.catalogString}")
    else TypeCheckSuccess
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static JVM entry shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
