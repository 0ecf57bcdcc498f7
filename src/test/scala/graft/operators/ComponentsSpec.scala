package graft.operators

import graft.SparkTestBase

/** Convergence invariants of the q38 min-label propagation, on synthetic
  * graphs whose answers are known by construction.
  */
class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Dedup.components(edges.toDF("a_id", "b_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("path graph: the worst diameter shape still labels every node with the min") {
    // 0-1-2-...-9: diameter 9, min label must walk the whole chain
    val got = run((0L until 9L).map(i => (i, i + 1)))
    assert(got.keySet == (0L to 9L).toSet)
    assert(got.values.forall { case (comp, n) => comp == 0L && n == 10L })
  }

  test("two cliques and a bridge pair keep distinct components") {
    val cliqueA = for (i <- 0 to 3; j <- i + 1 to 3) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 to 13; j <- i + 1 to 13) yield (i.toLong, j.toLong)
    val pair = Seq((100L, 101L))
    val got = run(cliqueA ++ cliqueB ++ pair)
    assert((0L to 3L).forall(got(_) == ((0L, 4L))))
    assert((10L to 13L).forall(got(_) == ((10L, 4L))))
    assert(got(100L) == ((100L, 2L)) && got(101L) == ((100L, 2L)))
  }

  test("edge direction does not matter (undirected propagation)") {
    // all edges point from HIGH id to LOW id — propagation must still
    // carry the min label "uphill" through the reversed union
    val got = run(Seq((5L, 4L), (4L, 3L), (3L, 2L)))
    assert(got.values.forall { case (comp, n) => comp == 2L && n == 4L })
  }

  test("empty edge list yields an empty result, no iteration") {
    assert(run(Seq.empty).isEmpty)
  }
}
