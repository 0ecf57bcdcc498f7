package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Structural invariants of the dataset-assembly tier — properties the
  * DuckDB hash-match can't express (it checks equality, not meaning).
  */
class AssembleSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q57: splits partition the corpus — counts sum to total, all three present") {
    val total = graft.Tables.t(spark, sf, "documents").count()
    val rows = q("q57_train_val_test_split").collect()
    assert(rows.map(_.getAs[String]("split")).sorted.toSeq ==
      Seq("test", "train", "val"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // the hash split should land near 80/10/10 — train strictly largest
    val byName = rows.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
  }

  test("q58: packing conserves tokens and bins are the contiguous prefix sum") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, sf, "documents")
    val totalTokens = docs.select(
      coalesce(size(expr(Dedup.toksExpr)).cast("long"), lit(0L)).as("n"))
      .agg(sum($"n")).as[Long].head()
    val bins = q("q58_sequence_packing").collect()
    assert(bins.map(_.getAs[Long]("n_tokens")).sum == totalTokens,
      "packing lost or duplicated tokens")
    assert(bins.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // bins are dense from 0 (every 512-token window that STARTS a doc)
    val ids = bins.map(_.getAs[Long]("bin")).toSeq
    assert(ids == ids.sorted && ids.head == 0L)
    // doc id spans don't overlap across consecutive bins
    val spans = bins.sortBy(_.getAs[Long]("bin"))
      .map(r => (r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
    assert(spans.forall { case (a, b) => a <= b })
    assert(spans.sliding(2).forall {
      case Array((_, lastA), (firstB, _)) => lastA < firstB
      case _ => true
    })
  }

  test("q37: contamination hits are bounded by the doc's gram count") {
    val rows = q("q37_contamination").collect()
    assert(rows.nonEmpty, "fixture corpus has no contaminated test docs — " +
      "the spec would be vacuous")
    rows.foreach { r =>
      val (n, hit) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"))
      assert(hit >= 1 && hit <= n)
      val ratio = r.getAs[Double]("hit_ratio")
      assert(ratio > 0.0 && ratio <= 1.0)
    }
  }
}
