package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property: for ARBITRARY inputs, count-window packing obeys
  * the reference's buffer invariants (SURVEY.md §5 test plan):
  * per group, exactly ⌊n/packLen⌋ full packs are emitted, positions run
  * 0..packLen−1 per pack, and concatenating the packs reproduces the
  * group's input prefix in arrival order.
  */
object PackingProperties extends Properties("CountWindow.packByCount") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)  // each case runs a Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genCase = for {
    n <- Gen.choose(0, 60)
    packLen <- Gen.choose(1, 12)
    nGroups <- Gen.choose(1, 3)
    keys <- Gen.listOfN(n, Gen.choose(0L, nGroups.toLong - 1))
  } yield (keys, packLen)

  property("emits exactly the full packs, in arrival order") =
    Prop.forAll(genCase) { case (keys, packLen) =>
      import spark.implicits._
      spark.sparkContext.setLogLevel("ERROR")
      val input = keys.zipWithIndex.map { case (k, i) => Reading(k, i.toDouble, i.toLong) }
      // single partition + input order → deterministic iterator order
      val df = input.toDF().coalesce(1).sortWithinPartitions("seq")
      val out = CountWindow.packByCount(df, "level", packLen)
        .collect()
        .map(r => (r.getAs[Long]("level"), r.getAs[Double]("rh"),
          r.getAs[Long]("pack_seq"), r.getAs[Int]("pack_pos")))

      val byGroup = input.groupBy(_.level)
      byGroup.forall { case (g, rows) =>
        val expectFull = rows.size / packLen
        val got = out.filter(_._1 == g).sortBy(t => (t._3, t._4))
        val countOk = got.length == expectFull * packLen
        // packs reproduce the group's input prefix in order
        val orderOk = got.map(_._2).toSeq ==
          rows.map(_.rh).take(expectFull * packLen)
        val posOk = got.map(_._4).toSeq ==
          Seq.fill(expectFull)(0 until packLen).flatten
        countOk && orderOk && posOk
      }
    }
}
