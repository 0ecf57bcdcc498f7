package graft.operators

import graft.SparkTestBase

/** Semantic pin for q78 beyond the DuckDB hash gate: an independent
  * driver-side recompute over the sf0.001 fixture (500 vectors — small
  * enough to fold by hand) must agree exactly with the distributed
  * bounded-k-min formulation, including the r6-micros rounding and the
  * vec_id tiebreak.
  */
class CentroidOutlierSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("q78: reported outliers are exactly the k lowest-cosine vectors per label") {
    val k = graft.config.Tuning.current.outlierK
    val vecs = graft.Tables.t(spark, sf, "embeddings").collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    }
    assert(vecs.nonEmpty)
    val expected = vecs.groupBy(_._2).toSeq.flatMap { case (label, vs) =>
      val dims = vs.head._3.length
      val cent = Array.tabulate(dims)(i => r6(vs.map(_._3(i)).sum / vs.length))
      val nc = cent.map(c => c * c).sum
      vs.flatMap { case (id, _, v) =>
        val dot = v.zip(cent).map { case (a, b) => a * b }.sum
        val nv = v.map(a => a * a).sum
        if (nv > 0 && nc > 0)
          Some((label, id, math.floor(dot / math.sqrt(nv * nc) * 1e6 + 0.5).toLong))
        else None
      }.sortBy { case (_, id, m) => (m, id) }
        .take(k).zipWithIndex
        .map { case ((l, id, m), i) => (l, (i + 1).toLong, id, m / 1e6) }
    }.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("q78_centroid_outliers")(spark, sf)
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    assert(got == expected)
  }
}
