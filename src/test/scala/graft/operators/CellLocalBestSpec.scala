package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The property that makes the IVF probe-side blocking safe: results
  * are BLOCK-INVARIANT. A probe lands in exactly one id-block of each
  * cell it probes, and the home side replicates into every block, so
  * the per-(cell, block) best equals the per-cell best no matter how
  * many blocks the size heuristic picks. This spec runs the shared
  * pairing kernel at several block counts over the real embeddings
  * and pins byte-identical output — if someone changes the block key
  * to something that can split a probe from part of its candidate
  * set, this fails.
  */
class CellLocalBestSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def sim = new Similarity(graft.config.Tuning.current)

  test("per-cell bests are identical at nBlocks = 1, 3, 8") {
    import spark.implicits._
    // a synthetic 7-cell layout over the real vectors: cell = vec_id % 7,
    // every vector probing its own and the next cell (a multiprobe shape)
    val emb = graft.Tables.t(spark, sf, "embeddings")
      .select($"vec_id").as[Long].collect()
    val home = emb.map(id => (id, id % 7)).toSeq.toDF("b_id", "cell")
    val probes = emb.flatMap(id => Seq((id, id % 7), (id, (id + 1) % 7)))
      .toSeq.toDF("a_id", "cell")
    val runs = Seq(1, 3, 8).map { nb =>
      sim.cellLocalBest(spark, sf, probes, home, nb, n0 = emb.length.toLong)
        .orderBy($"cell", $"a_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          math.floor(r.getDouble(3) * 1e9 + 0.5) / 1e9)).toSeq
    }
    assert(runs(0).nonEmpty)
    assert(runs(0) == runs(1), "nBlocks 1 vs 3 diverged")
    assert(runs(0) == runs(2), "nBlocks 1 vs 8 diverged")
    // every probe with a non-self candidate in a probed cell got a row
    // per probed cell, none more
    val perKey = runs(0).groupBy(r => (r._1, r._2)).map(_._2.length)
    assert(perKey.forall(_ == 1), "duplicate best for one (cell, probe)")
  }
}
