package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (BENCH_r{N}.json).
  *
  * Queries are forced through the `noop` sink rather than `.count()` so
  * Catalyst cannot prune away projections/windows and under-report work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JIT/codegen + parquet-footer warmup on a NAMED cheap query (a Map's
    // .head is hash-order — it could warm an expensive or irrelevant one)
    // so the first measured query isn't charged for JVM warmup.
    try SparkEntry.queries("q01_agg_pricing")(spark, sfDir).write
      .mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }

    // Each query runs TWICE and reports the min: this VM shows 5-100×
    // per-run swings from co-tenant CPU steal, and a single burst during
    // a single-shot run manufactures phantom regressions. min-of-2 needs
    // the burst to cover BOTH runs to distort the number; both raw times
    // are kept in "runs" so a steal window is visible in the record.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // per-query .cache()s (dedup/ANN subplans) are scoped to the
        // query; drop them so the second run repeats the full work and
        // later queries aren't squeezed by a growing pool
        spark.catalog.clearCache()
        dt
      }
      System.err.println(
        f"[bench] $name%-32s ${times.min}%8.2f s  (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
      name -> times
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":${v.min}%.3f""" }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"runs":$raw,"sf":"$sfDir"}""")
    spark.stop()
  }
}
