package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Count-window packing semantics — ports the reference's buffer tests
  * (tests/test_parser.py:124-177: fill/emit/clear cycle, per-group
  * independence, partial buffers never emitted).
  */
case class Reading(level: Long, rh: Double, seq: Long)

class CountWindowSpec extends SparkTestBase {
  import spark.implicits._

  test("batch: exact packs emitted with pack_seq/pack_pos, remainder dropped") {
    val df = (0L until 25L).map(i => Reading(1L, i * 0.5, i)).toDF()
      .orderBy("seq")
    val packed = CountWindow.packByCount(df, "level", 10)
    val rows = packed.orderBy("pack_seq", "pack_pos").collect()
    assert(rows.length == 20)                      // 25 → 2 full packs of 10
    assert(rows.map(_.getAs[Long]("pack_seq")).distinct.toSeq == Seq(0L, 1L))
    assert(rows.take(10).map(_.getAs[Int]("pack_pos")).toSeq == (0 until 10))
  }

  test("batch: groups pack independently (reference per-group buffers)") {
    val df = (0L until 40L).map(i => Reading(i % 2, i.toDouble, i)).toDF()
    val packed = CountWindow.packByCount(df, "level", 15)
    // 20 rows per group → one pack of 15 each, 5 buffered/dropped
    val byGroup = packed.groupBy("level").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byGroup == Map(0L -> 15L, 1L -> 15L))
  }

  test("streaming: state carries partial buffers across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Reading]
    val packed = CountWindow.packByCount(mem.toDF(), "level", 10)
    val q = packed.writeStream.format("memory").queryName("packs")
      .outputMode("append").start()
    try {
      mem.addData((0L until 7L).map(i => Reading(1L, i.toDouble, i)))
      q.processAllAvailable()
      assert(spark.table("packs").count() == 0)    // buffer not full yet
      mem.addData((7L until 13L).map(i => Reading(1L, i.toDouble, i)))
      q.processAllAvailable()
      val rows = spark.table("packs").orderBy("pack_pos").collect()
      assert(rows.length == 10)                    // 13 seen → 1 pack, 3 buffered
      assert(rows.map(_.getAs[Double]("rh")).toSeq == (0 until 10).map(_.toDouble))
      mem.addData((13L until 20L).map(i => Reading(1L, i.toDouble, i)))
      q.processAllAvailable()
      assert(spark.table("packs").count() == 20)   // second pack completed
      assert(spark.table("packs").groupBy("pack_seq").count().count() == 2)
    } finally q.stop()
  }
}
