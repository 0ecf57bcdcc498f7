package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType,
  StructField, StructType}

/** Bounded top-K-by-score aggregate: keeps the `k` best `(score, id)`
  * pairs per group under the total order (score DESC, id ASC) and
  * evals to them, best first, as an array of `(doc_id, score)` structs.
  *
  * This is [[KMinValues]]' pattern applied to ranked retrieval: state
  * is a capped ordered set — at most `k` entries per group, CONSTANT
  * in the input size — and it merges associatively, so Spark plans it
  * as a two-phase ObjectHashAggregate with map-side partials. The
  * alternative (`repartition(key)` + sorted-partition streaming emit)
  * is oracle-equivalent but externally sorts EVERY row of a group in
  * one task — for a head term's posting list at corpus scale, a
  * single-task corpus-proportional funnel. Here each map task reduces
  * its slice to ≤ k entries before anything shuffles.
  *
  * (id uniqueness per group is the caller's contract — e.g. one
  * posting row per (term, doc) — making the order total; duplicate
  * ids would be kept as distinct entries.)
  */
case class TopKScored(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, "top_k_scored requires k > 0")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "top_k_scored requires (DOUBLE score, BIGINT id), got " +
        s"(${score.dataType.catalogString}, ${id.dataType.catalogString})")

  /** Best-first total order: higher score first, then lower id. The
    * worst retained entry is the TreeSet's last — O(log k) eviction.
    */
  private object BestFirst extends java.util.Comparator[(Double, Long)]
      with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](BestFirst)

  private def add(buf: java.util.TreeSet[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (buf.size < k) buf.add(e)
    else if (BestFirst.compare(e, buf.last) < 0) {
      if (buf.add(e)) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      add(buf, (sv.asInstanceOf[Double], iv.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Long)],
      other: java.util.TreeSet[(Double, Long)])
      : java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, d) = it.next()
      out(i) = InternalRow(d, s)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, d) = it.next()
      bb.putDouble(s); bb.putLong(d)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = bb.getDouble; val d = bb.getLong
      buf.add((s, d))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("bm25", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_scored"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScored =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScored =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKScored =
    copy(score = newLeft, id = newRight)
}

object TopKScored {
  /** `top_k_scored(score, id, k)` as a Column aggregate. */
  def topKScored(score: Column, id: Column, k: Int): Column =
    GraftShims.toColumn(
      TopKScored(GraftShims.toExpression(score),
        GraftShims.toExpression(id), k).toAggregateExpression())
}
