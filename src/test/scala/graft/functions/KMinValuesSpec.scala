package graft.functions

import graft.SparkTestBase
import graft.functions.KMinValues.kMinValues
import org.apache.spark.sql.functions._

class KMinValuesSpec extends SparkTestBase {

  test("keeps the k smallest DISTINCT values, sorted ascending") {
    import spark.implicits._
    // duplicates of small values must not evict larger distinct ones
    val vals = Seq(5L, 1L, 1L, 1L, 9L, 3L, 3L, 7L, 2L)
    val out = vals.toDF("v").agg(kMinValues($"v", 4).as("m"))
      .as[Array[Long]].head()
    assert(out.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("fewer than k distinct inputs returns them all; nulls are skipped") {
    import spark.implicits._
    val out = Seq[java.lang.Long](4L, null, 4L, 8L).toDF("v")
      .agg(kMinValues($"v", 256).as("m")).as[Array[Long]].head()
    assert(out.toSeq == Seq(4L, 8L))
  }

  test("merge across partitions equals single-partition result") {
    import spark.implicits._
    val vals = (1L to 10000L).map(i => (i * 2654435761L) % 100003L)
    val single = vals.toDF("v").coalesce(1)
      .agg(kMinValues($"v", 64).as("m")).as[Array[Long]].head()
    val merged = vals.toDF("v").repartition(16)
      .agg(kMinValues($"v", 64).as("m")).as[Array[Long]].head()
    assert(merged.toSeq == single.toSeq)
    assert(merged.length == 64 && merged.toSeq == merged.toSeq.sorted)
  }

  test("grouped aggregation matches a window-sort reference") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (s"g${i % 3}", (i * 48271L) % 9973L))
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(kMinValues($"v", 10).as("m"))
      .select($"g", explode($"m").as("v"))
      .orderBy($"g", $"v").as[(String, Long)].collect().toSeq
    val exp = df.distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v")))
      .filter($"rn" <= 10).select($"g", $"v")
      .orderBy($"g", $"v").as[(String, Long)].collect().toSeq
    assert(got == exp)
  }
}
