package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for ad-hoc profiling/drives — contents change freely
  * between sessions; not part of the library surface.
  *
  * Current contents: q31 stage-split profile at a given sf dir.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    import graft.operators.Dedup.{toksExpr, shinglesExpr}
    val ex = Tables.t(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"doc_id", expr(toksExpr).as("toks"))
      .select($"doc_id", expr(shinglesExpr).as("sh"))
      .select($"doc_id", size($"sh").as("nsh"), explode($"sh").as("s0"))
      .select($"doc_id", $"nsh", graft.Cols.md5Long($"s0").as("s"))
      .cache()
    val nPost = time("postings (shingle+md5)")(ex.count())
    val hot = ex.groupBy($"s").agg(count(lit(1)).as("df")).filter($"df" > 100).select($"s")
    val nHot = time("hot shingles (df>100)")(hot.count())
    val exc = ex.join(hot, Seq("s"), "left_anti")
    val pairsDf = exc.as("a")
      .join(exc.as("b"), $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
        $"a.nsh".as("na"), $"b.nsh".as("nb"))
      .agg(count(lit(1)).as("common"))
    val nPairs = time("pair join + agg")(pairsDf.count())
    println(s"[scratch] postings=$nPost hot=$nHot pairs=$nPairs")
    spark.stop()
  }
}
