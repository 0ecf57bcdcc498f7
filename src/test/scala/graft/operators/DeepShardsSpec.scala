package graft.operators

import graft.SparkTestBase
import graft.config.Tuning

/** The supplied-merge-table shard builder ([[Bpe.ensureShardsFor]]):
  * given the artifact's OWN merges it must reproduce [[Bpe.ensureShards]]
  * byte-for-byte (the builder swap to the rank-heap encoder changed
  * nothing stored); given a DEEP locally-trained table it must ship a
  * coherent lake (lossless decode, manifest ≡ data mass) the
  * replace-chain builder could never host; and distinct tables must
  * key distinct artifacts with no-op replays.
  */
class DeepShardsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private val tuning = Tuning(bpeMerges = 12)
  private val bpe = new Bpe(tuning)

  private def dump(p: String) = {
    import spark.implicits._
    spark.read.parquet(s"$p/data")
      .select($"doc_id", $"bin", $"n_tokens", $"token_ids")
      .as[(Long, Long, Long, Seq[Int])].collect().sortBy(_._1).toSeq
  }

  test("with the artifact's own merges, ensureShardsFor ≡ ensureShards") {
    import spark.implicits._
    val p0 = bpe.ensureShards(spark, sf)
    val merges = spark.read.parquet(s"$p0/merges").orderBy($"rank")
      .select($"rank", $"l", $"r", $"merged", $"pair_count")
      .as[Bpe.Merge].collect().toSeq
    val p1 = bpe.ensureShardsFor(spark, sf, merges)
    assert(p1 != p0, "supplied-table lake keys separately")
    assert(dump(p1) == dump(p0))
    val v0 = spark.read.parquet(s"$p0/vocab").as[(Int, String)].collect().sortBy(_._1)
    val v1 = spark.read.parquet(s"$p1/vocab").as[(Int, String)].collect().sortBy(_._1)
    assert(v1.sameElements(v0))
  }

  test("a deep locally-trained table ships a coherent lake") {
    import spark.implicits._
    val deep = bpe.trainLocalMerges(spark, sf, 1500)
    assert(deep.size > 60)
    val p = bpe.ensureShardsFor(spark, sf, deep)
    val builds = Bpe.shardBuilds.get()
    // replay (fresh instance) resolves the artifact, no rebuild
    assert(new Bpe(tuning).ensureShardsFor(spark, sf, deep) == p)
    assert(Bpe.shardBuilds.get() == builds)
    // lossless decode: stored ids -> tokens -> concatenation == the
    // doc's kept words, for every document
    val tokOf = spark.read.parquet(s"$p/vocab")
      .as[(Int, String)].collect().toMap
    val stored = dump(p)
    val texts = graft.Tables.t(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    stored.foreach { case (id, _, n, ids) =>
      assert(ids.size == n)
      val kept = Option(texts(id)).getOrElse("").toLowerCase
        .split("\\s+").filter(w =>
          w.nonEmpty && !w.contains("(") && !w.contains(")"))
      assert(ids.map(tokOf).mkString == kept.mkString, s"doc $id")
    }
    // manifest mass ≡ data mass
    val man = spark.read.parquet(s"$p/manifest")
      .selectExpr("sum(n_tokens)").as[Long].collect().head
    assert(man == stored.map(_._3).sum)
    // the deep table actually bites: fewer tokens than the 12-merge lake
    val shallow = dump(bpe.ensureShards(spark, sf))
    assert(stored.map(_._3).sum < shallow.map(_._3).sum)
  }
}
