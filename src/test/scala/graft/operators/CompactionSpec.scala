package graft.operators

import graft.SparkTestBase
import graft.config.Tuning

/** The compaction contract on both delta lakes: N add segments +
  * tombstones fold into ONE generation; serving is bit-identical
  * before and after (and after vacuum); a tombstoned id whose only
  * rows lived in a folded segment becomes re-addable, while a
  * tombstoned BASE id stays permanently retired (the base tables are
  * oracle-pinned and never rewritten); re-compacting with nothing new
  * is a no-op.
  */
class CompactionSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private val knobs = Tuning(annQueries = 3, lloydIters = 1, nprobe = 2,
    pqCentroids = 8)

  private def withTempRoot[A](body: => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-compact-spec")
    val prev = sys.props.get("graft.index.dir")
    sys.props("graft.index.dir") = root.toString
    try body
    finally prev match {
      case Some(v) => sys.props("graft.index.dir") = v
      case None => sys.props -= "graft.index.dir"
    }
  }

  private def novel(seed: Int): Array[Float] =
    Array.tabulate(64)(i => if (i == seed % 64) 5f else 0.01f)

  test("vector store: fold segments+tombstones, serve identical, re-add compacted id") {
    withTempRoot {
      val sim = new Similarity(knobs)
      // two add segments, two tombstone segments (one added id, one corpus id)
      assert(sim.addVectors(spark, sf,
        Seq(910001L -> novel(3), 910002L -> novel(17))))
      assert(sim.addVectors(spark, sf, Seq(910010L -> novel(29))))
      assert(sim.removeVectors(spark, sf, Seq(910001L)))
      assert(sim.removeVectors(spark, sf, Seq(7L)))

      val probes = Seq(1L -> novel(17), 2L -> novel(29), 3L -> novel(3))
      def serve(): Seq[(Long, Long, Long)] =
        sim.search(spark, sf, probes, k = 2).collect().toSeq
          .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rk"),
            r.getAs[Long]("n_id")))
      val before = serve()
      // sanity on the pre-compact view: live adds served, tombstoned not
      assert(before.contains((1L, 1L, 910002L)))
      assert(before.contains((2L, 1L, 910010L)))
      assert(!before.exists(_._3 == 910001L), "tombstoned add still served")

      val compactsBefore = Similarity.indexCompacts.get()
      assert(sim.compact(spark, sf), "compact must install a generation")
      assert(Similarity.indexCompacts.get() == compactsBefore + 1)
      assert(serve() == before, "serve changed across compact")
      assert(!sim.compact(spark, sf), "nothing unconsumed — compact must no-op")

      // an at-least-once replay of content the generation folded AND
      // kept live is still the quiet no-op, not a conflict
      assert(!sim.addVectors(spark, sf, Seq(910010L -> novel(29))),
        "replay of folded live content must no-op")

      // the folded-away tombstoned ADD id is free again...
      assert(sim.addVectors(spark, sf, Seq(910001L -> novel(40))),
        "compacted-away id must be re-addable")
      val after = sim.search(spark, sf, Seq(9L -> novel(40)), k = 1).collect()
      assert(after.head.getAs[Long]("n_id") == 910001L)
      // ...while the BASE id stays retired (base is oracle-pinned)
      val e = intercept[IllegalArgumentException](
        sim.addVectors(spark, sf, Seq(7L -> novel(5))))
      assert(e.getMessage.contains("already indexed"))

      // a second compact folds the NEW segment into generation 2
      assert(sim.compact(spark, sf))
      assert(serve() == before)

      // vacuum drops every consumed segment dir; serving is unaffected
      assert(sim.vacuum(sf) >= 4, "vacuum must remove the folded segments")
      assert(serve() == before, "serve changed after vacuum")
    }
  }

  test("dedup lake: fold, serve identical, re-add compacted id, vacuum") {
    withTempRoot {
      val dd = new Dedup(knobs)
      val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      val tB = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
      assert(dd.addDocs(spark, sf, Seq(810001L -> tA)))
      assert(dd.addDocs(spark, sf, Seq(810002L -> tB)))
      assert(dd.removeDocs(spark, sf, Seq(810001L)))
      assert(dd.removeDocs(spark, sf, Seq(3L))) // corpus doc

      def serve(): Seq[(Long, Long)] =
        dd.serveSimhashMatches(spark, sf, Seq(1L -> tA, 2L -> tB))
          .collect().toSeq
          .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("match_id")))
      val before = serve()
      assert(before.contains((2L, 810002L)), "live add not served")
      assert(!before.exists(_._2 == 810001L), "tombstoned add still served")

      val compactsBefore = Dedup.sigCompacts.get()
      assert(dd.compact(spark, sf), "compact must install a generation")
      assert(Dedup.sigCompacts.get() == compactsBefore + 1)
      assert(serve() == before, "serve changed across compact")
      assert(!dd.compact(spark, sf))

      assert(!dd.addDocs(spark, sf, Seq(810002L -> tB)),
        "replay of folded live content must no-op")
      assert(dd.addDocs(spark, sf, Seq(810001L -> tA)),
        "compacted-away id must be re-addable")
      assert(serve().contains((1L, 810001L)))
      val e = intercept[IllegalArgumentException](
        dd.addDocs(spark, sf, Seq(3L -> "anything at all here")))
      assert(e.getMessage.contains("already indexed"))

      assert(dd.compact(spark, sf))
      assert(dd.vacuum(sf) >= 4)
      assert(serve().contains((1L, 810001L)), "serve changed after vacuum")
    }
  }
}
