package graft.functions

import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's custom expressions as SQL-callable functions, so a pure
  * `spark.sql(...)` user reaches them without the Scala API:
  *
  *  - `regexp_extract_named(value, pattern)` — the reference's core
  *    single-pass named-group projection (P1), same name as the Scala
  *    API (and Spark's regexp_extract convention).
  *  - `k_min_values(col, k)` — the bounded k-min aggregate behind the
  *    KMV sketch (q29) and quota sampling (q59).
  *  - `nfc_normalize(value)` — Unicode NFC (UAX #15) with real
  *    codegen, name-matched to DuckDB's `nfc_normalize` (q92).
  *
  * Two registration paths, same builders: [[register]] for a live
  * session, [[graft.GraftExtensions]] for
  * `--conf spark.sql.extensions=graft.GraftExtensions` deployments.
  */
object GraftFunctions {

  private def fail(fn: String, usage: String): Nothing =
    throw new IllegalArgumentException(s"$fn expects $usage")

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("regexp_extract_named"),
      new ExpressionInfo(classOf[RegexExtractNamed].getName, "regexp_extract_named"),
      { case Seq(child, Literal(p: UTF8String, StringType)) =>
          // pattern validation lives in the expression's own
          // checkInputDataTypes, so EVERY construction surface (SQL,
          // Scala API, config) fails analysis with the real error
          RegexExtractNamed(child, p.toString)
        case _ =>
          fail("regexp_extract_named", "(value, pattern STRING LITERAL)")
      }: Seq[Expression] => Expression),
    (FunctionIdentifier("k_min_values"),
      new ExpressionInfo(classOf[KMinValues].getName, "k_min_values"),
      { case Seq(child, Literal(k: Int, IntegerType)) =>
          KMinValues(child, k)
        case _ =>
          fail("k_min_values", "(col BIGINT, k INT LITERAL)")
      }: Seq[Expression] => Expression),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      { case Seq(child) => NfcNormalize(child)
        case _ => fail("nfc_normalize", "(value STRING)")
      }: Seq[Expression] => Expression))

  /** Register everything on an already-running session. */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      GraftShims.registerFunction(spark, id.funcName, info, builder)
    }

  // weak keys: a registered-set entry must not pin a stopped session
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotent [[register]] — the hook the operator surfaces call at
    * plan-build time ([[graft.Tables.t]], the ad-hoc serve faces), so
    * a SQL fragment interpolating an engine function (`nfc_normalize`
    * under [[graft.config.Tuning.normalizeNfc]]) resolves in ANY
    * session without the caller wiring `spark.sql.extensions`.
    *
    * Fully synchronized, no fast path: WeakHashMap READS mutate
    * internal state (expungeStaleEntries), so an unsynchronized
    * `contains` racing the writer can corrupt the map. Registration is
    * cheap and idempotent — plain mutual exclusion is the correct
    * shape, not double-checked locking.
    */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      register(spark)
      registered.add(spark)
    }
  }
}
