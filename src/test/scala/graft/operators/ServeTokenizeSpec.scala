package graft.operators

import graft.SparkTestBase
import graft.config.Tuning

/** The served tokenizer ([[Bpe.serveTokenize]]): ad-hoc text encoded
  * against the STORED artifact (frozen merges + id table) — corpus
  * texts must reproduce the stored shard sequences byte-for-byte (raw
  * AND curated), out-of-corpus text must encode deterministically
  * with -1 only for never-seen subwords, and a fresh instance must
  * serve without rebuilding or retraining.
  */
class ServeTokenizeSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private val tuning = Tuning(bpeMerges = 12)
  private val bpe = new Bpe(tuning)
  private val search = new Search(tuning)

  test("serving the corpus's own documents reproduces the stored shard sequences") {
    import spark.implicits._
    val texts = graft.Tables.t(spark, sf, "documents")
      .select($"doc_id".as("id"), $"text")
    val served = bpe.serveTokenize(spark, sf, texts)
      .select($"id", $"token_ids").as[(Long, Seq[Int])].collect().toMap
    val stored = spark.read.parquet(s"${bpe.shardsPath(sf)}/data")
      .select($"doc_id", $"token_ids").as[(Long, Seq[Int])].collect().toMap
    assert(served.keySet == stored.keySet)
    assert(served == stored)
    // a corpus text never yields UNK — every subword is in the table
    assert(!served.values.exists(_.contains(-1)))
  }

  test("curated serving reproduces the q90 stored sequences over stripped text") {
    import spark.implicits._
    val texts = search.stripRuns(spark, sf)
      .toDF("id", "text")
    val served = bpe.serveTokenize(spark, sf, texts, curated = true)
      .select($"id", $"token_ids").as[(Long, Seq[Int])].collect().toMap
    val stored = spark.read.parquet(s"${bpe.curatedShardsPath(sf)}/data")
      .select($"doc_id", $"token_ids").as[(Long, Seq[Int])].collect().toMap
    assert(served == stored)
  }

  test("out-of-corpus text: known subwords encode, never-seen chars map to -1") {
    import spark.implicits._
    val vocab = spark.read.parquet(s"${bpe.shardsPath(sf)}/vocab")
      .as[(Int, String)].collect()
    val idOf = vocab.map(_.swap).toMap
    // a single-char word built from a known single-char token encodes
    // exactly; the paren word drops; the never-seen char is UNK
    val knownChar = vocab.map(_._2).filter(_.length == 1)
      .find(c => c != "(" && c != ")").get
    val out = bpe.serveTokenize(spark, sf,
      Seq(
        (1L, knownChar),
        (2L, s"$knownChar (x) §"),
        (3L, ""),
        (4L, null.asInstanceOf[String]))
        .toDF("id", "text"))
      .select($"id", $"token_ids", $"n_tokens")
      .as[(Long, Seq[Int], Long)].collect().sortBy(_._1)
    assert(out(0)._2 == Seq(idOf(knownChar)))
    assert(out(1)._2 == Seq(idOf(knownChar), -1), "paren word drops, § is UNK")
    assert(out(2)._2.isEmpty && out(2)._3 == 0L)
    assert(out(3)._2.isEmpty && out(3)._3 == 0L)
    // determinism: a second call is bit-identical
    val again = bpe.serveTokenize(spark, sf,
      Seq((2L, s"$knownChar (x) §")).toDF("id", "text"))
      .select($"token_ids").as[Seq[Int]].collect().head
    assert(again == out(1)._2)
  }

  test("a fresh instance serves from the stored artifact without rebuilding") {
    import spark.implicits._
    bpe.serveTokenize(spark, sf, Seq((1L, "warm")).toDF("id", "text")).count()
    val before = Bpe.shardBuilds.get()
    val other = new Bpe(tuning)
    val served = other.serveTokenize(spark, sf,
      Seq((7L, "a fresh session")).toDF("id", "text")).count()
    assert(served == 1L)
    assert(Bpe.shardBuilds.get() == before)
  }
}
