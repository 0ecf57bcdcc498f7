package graft.operators

import graft.SparkTestBase
import graft.config.Tuning
import org.apache.spark.sql.functions._

/** The materialized training shards ([[Bpe.ensureShards]]) beyond the
  * q87 hash gate: the stored artifact must round-trip against the q84
  * bin manifest, carry sequences whose lengths match the planned
  * token counts, decode back to the document's actual words through
  * the stored vocab table, and replay as a no-op.
  */
class PackShardsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private val tuning = Tuning(bpeMerges = 12)
  private val bpe = new Bpe(tuning)

  private lazy val path = bpe.ensureShards(spark, sf)

  test("shard manifest ≡ q84 bins") {
    val manifest = spark.read.parquet(s"$path/manifest")
      .orderBy("bin").collect().map(_.toSeq).toSeq
    val q84 = bpe.all.find(_.name == "q84_bpe_packing").get
      .spark(spark, sf).collect().map(_.toSeq).toSeq
    assert(manifest == q84)
  }

  test("every stored sequence has exactly its planned token count") {
    val bad = spark.read.parquet(s"$path/data")
      .where(size(col("token_ids")) =!= col("n_tokens"))
      .count()
    assert(bad == 0)
    // and the data table covers every document exactly once
    val docs = graft.Tables.t(spark, sf, "documents").count()
    assert(spark.read.parquet(s"$path/data").select("doc_id").distinct().count() == docs)
    assert(spark.read.parquet(s"$path/data").count() == docs)
  }

  test("sequences decode back to the document's words through the stored vocab") {
    import spark.implicits._
    val vocab = spark.read.parquet(s"$path/vocab").as[(Int, String)]
      .collect().toMap
    val stored = spark.read.parquet(s"$path/data")
      .select($"doc_id", $"token_ids").as[(Long, Seq[Int])]
      .collect().toMap
    val docs = graft.Tables.t(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // ids → token strings → concatenated per doc must equal the doc's
    // lowercased whitespace words (minus paren-words, which are
    // excluded from the BPE vocabulary) concatenated
    docs.take(50).foreach { case (id, text) =>
      val words =
        if (text == null) Array.empty[String]
        else text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          .filter(w => w.nonEmpty && !w.contains("(") && !w.contains(")"))
      val decoded = stored(id).map(vocab).mkString
      assert(decoded == words.mkString, s"doc $id")
    }
  }

  test("replay is a no-op; a second instance reuses the artifact") {
    val before = Bpe.shardBuilds.get()
    bpe.ensureShards(spark, sf)
    assert(Bpe.shardBuilds.get() == before)
    val other = new Bpe(tuning)
    assert(other.ensureShards(spark, sf) == path)
    assert(Bpe.shardBuilds.get() == before)
  }

  test("shard dirs bundle 64 bins and rows arrive bin-sorted") {
    import spark.implicits._
    val data = spark.read.parquet(s"$path/data")
    val offenders = data.where($"shard" =!= ($"bin" / 64).cast("long")).count()
    assert(offenders == 0)
  }
}
