package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded k-minimum-values aggregate: keeps the `k` smallest DISTINCT
  * long inputs per group and evals to them as a sorted ascending array.
  *
  * This is the scale-safe exact form of the KMV distinct-count sketch
  * (q29): state is a capped ordered set — at most `k` longs per group,
  * CONSTANT in the input size — and it merges associatively, so Spark
  * plans it as an ordinary two-phase ObjectHashAggregate with map-side
  * partials. The round-2 formulation (`row_number() OVER (PARTITION BY
  * group ORDER BY h)` then `rn <= k`) was oracle-equivalent but sorted
  * ALL distinct hashes of a group in one task — a skewed-key full sort
  * that a 100 TB group turns into a single-reducer bottleneck.
  *
  * Distinctness is part of the contract (KMV estimates distinct
  * cardinality from the k-th smallest UNIQUE hash); the TreeSet both
  * dedups and keeps the cap cheap (head/last are O(log k)).
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "k_min_values requires k > 0")

  // analysis-time contract: update() casts the input to Long, so a
  // non-long child must fail analysis with a clear message, not
  // executors at runtime with a ClassCastException (ExpectsInputTypes
  // is unusable here — its AbstractDataType is private[sql])
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"k_min_values requires BIGINT input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) buf.add(v)
    else if (v < buf.last) {
      // only shrink on a genuine insert — v may already be present
      if (buf.add(v)) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "k_min_values"

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}

object KMinValues {
  /** `k_min_values(c, k)` as a Column aggregate. */
  def kMinValues(c: Column, k: Int): Column =
    GraftShims.toColumn(
      KMinValues(GraftShims.toExpression(c), k).toAggregateExpression())
}
