package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the bounded k-min aggregate, driven at the
  * BUFFER level (no Spark session — the expression's update/merge/
  * serialize contract is pure), so hundreds of arbitrary cases run in
  * milliseconds. The Spark-integrated path is covered by
  * KMinValuesSpec and the q29/q59 oracles.
  */
object KMinValuesProperties extends Properties("KMinValues") {

  private def agg(k: Int) =
    KMinValues(BoundReference(0, LongType, nullable = true), k)

  private def evalSeq(a: KMinValues,
      buf: java.util.TreeSet[java.lang.Long]): Seq[Long] =
    a.eval(buf).asInstanceOf[ArrayData].toLongArray().toSeq

  private val genCase = for {
    k <- Gen.choose(1, 64)
    xs <- Gen.listOf(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    dups <- Gen.someOf(xs)  // force duplicates beyond chance collisions
  } yield (k, xs ++ dups)

  property("equals sorted-distinct-take-k for arbitrary input") =
    Prop.forAll(genCase) { case (k, xs) =>
      val a = agg(k)
      val buf = a.createAggregationBuffer()
      xs.foreach(x => a.update(buf, InternalRow(x)))
      evalSeq(a, buf) == xs.distinct.sorted.take(k)
    }

  property("merge of any split equals single-buffer aggregation") =
    Prop.forAll(genCase, Gen.choose(0, 100)) { case ((k, xs), cut0) =>
      val a = agg(k)
      val cut = if (xs.isEmpty) 0 else cut0 % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val bl = a.createAggregationBuffer()
      val br = a.createAggregationBuffer()
      l.foreach(x => a.update(bl, InternalRow(x)))
      r.foreach(x => a.update(br, InternalRow(x)))
      val whole = a.createAggregationBuffer()
      xs.foreach(x => a.update(whole, InternalRow(x)))
      evalSeq(a, a.merge(bl, br)) == evalSeq(a, whole)
    }

  property("serialize/deserialize round-trips the buffer exactly") =
    Prop.forAll(genCase) { case (k, xs) =>
      val a = agg(k)
      val buf = a.createAggregationBuffer()
      xs.foreach(x => a.update(buf, InternalRow(x)))
      evalSeq(a, a.deserialize(a.serialize(buf))) == evalSeq(a, buf)
    }

  property("null inputs never change the buffer") =
    Prop.forAll(genCase) { case (k, xs) =>
      val a = agg(k)
      val buf = a.createAggregationBuffer()
      xs.foreach { x =>
        a.update(buf, InternalRow(x))
        a.update(buf, InternalRow(null))
      }
      evalSeq(a, buf) == xs.distinct.sorted.take(k)
    }
}
