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

  test("q77: bloom prescreen is result-transparent — byte-identical to q37") {
    val exact = q("q37_contamination").collect().map(_.toSeq).toSeq
    val bloom = q("q77_contamination_bloom").collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty)
    assert(bloom == exact)
  }

  test("q77: the physical plan carries the might_contain prescreen") {
    val plan = q("q77_contamination_bloom").queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prescreen missing from the physical plan:\n$plan")
  }

  test("bloomPrescreen: no false negatives, near-total rejection of non-members") {
    import spark.implicits._
    val asm = new Assemble(graft.config.Tuning.current)
    val train = (1L to 100L).toDF("h")
    val evalSide = (51L to 150L).map(h => (h, h * 10)).toDF("h", "doc_id")
    val kept = asm.bloomPrescreen(train, evalSide).select($"h").as[Long].collect().toSet
    // every true member survives — the transparency guarantee
    assert((51L to 100L).forall(kept.contains))
    // at 2^23 bits over 100 items the fpp is ~0: effectively all of the
    // 50 non-members must be rejected (allow a couple of collisions)
    assert(kept.count(_ > 100L) <= 2, s"prescreen kept too much: $kept")
  }

  test("bloomPrescreen: empty train side rejects everything (null sketch path)") {
    import spark.implicits._
    val asm = new Assemble(graft.config.Tuning.current)
    val train = Seq.empty[Long].toDF("h")
    val evalSide = (1L to 10L).map(h => (h, h)).toDF("h", "doc_id")
    assert(asm.bloomPrescreen(train, evalSide).count() == 0L)
  }

  test("q81: keeper manifest agrees with q38 clusters and q51 scores") {
    val comps = q("q38_dedup_components").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[Long]("n_members"))).toMap
    val scores = q("q51_quality_score").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val manifest = q("q81_dedup_keeper_manifest").collect()
    assert(manifest.nonEmpty)
    // one row per distinct q38 component, each keeper a member with
    // the component's max q51 score (lowest id on ties)
    assert(manifest.length == comps.values.map(_._1).toSet.size)
    manifest.foreach { r =>
      val (compId, keeper) = (r.getAs[Long]("component"), r.getAs[Long]("keeper_id"))
      val members = comps.filter(_._2._1 == compId).keys.toSeq
      assert(members.contains(keeper))
      val best = members.map(m => (scores(m), m)).sortBy { case (sc, id) => (-sc, id) }.head
      assert(keeper == best._2 && r.getAs[Double]("keeper_score") == best._1)
      assert(r.getAs[Long]("n_dropped") == r.getAs[Long]("n_members") - 1)
      assert(r.getAs[Long]("n_members") == comps(keeper)._2)
    }
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
