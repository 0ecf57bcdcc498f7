package graft

import org.apache.spark.sql.SparkSession

/** Scale probe for the CORPUS-BOUND tiers past the testdata's sf0.1
  * ceiling: generates synthetic sf-equivalents 10× (and optionally
  * 100×) the driver's largest corpus with [[graft.operators
  * .SyntheticCorpus]] and measures the build paths (q69 sig-lake
  * build, q67 IVF-PQ index build, q58 packing, q38 near-dup
  * components) plus the serve paths (q72 dedup serve, q68 vector
  * store serve) at each size.
  *
  * Unlike [[Bench]] (which prewarms the disk artifacts so pass 1
  * times SERVING), this probe points `graft.index.dir` at a fresh
  * per-run root and reports each query's two passes SEPARATELY:
  * pass 1 of q69/q67 IS the cold store build — the number the probe
  * exists to watch grow — and pass 2 is the steady serve-path read.
  * α = log10(t_big/t_small) per 10× step, per pass.
  *
  * Usage: `scripts/run.sh graft.ScaleProbe [--wide] [mult ...]`
  * (default `1 10`; each mult m probes 5000·m docs / 2000·m
  * vectors — m=1 matches sf0.1's corpus size so the step anchors
  * against the known numbers; `--wide` sweeps the whole LLM tier
  * instead of the six corpus-bound queries). Prints one JSON line
  * on stdout; verbose timing streams to stderr.
  */
object ScaleProbe {

  private val probeQueries = Seq(
    // order matters for attribution: q69's pass 1 carries the ONE
    // sig-lake build, so q38/q72 measure their own work, not the
    // store's; same for q67 before q68.
    "q69_minhash_index_build",
    "q38_dedup_components",
    "q72_dedup_index_serve",
    "q67_ivf_pq_index_build",
    "q68_vector_store_serve",
    "q58_sequence_packing",
    // r12: the heaviest dedup-family operator gets its m1000 cell
    "q86_substring_runs",
    // r13: the shard lake and its served tokenizer join the deep
    // ladder — q87's pass 1 IS the shard build (train + encode +
    // pack + write), so q91 after it measures pure serving
    "q87_pack_shards",
    "q91_serve_tokenize",
    // r14: the served exact-substring face — pass 1 IS the runs
    // postings build; the probe batch is a 1% corpus slice, so the
    // serve cells grade batch-proportional serving (the FIXED-batch
    // corpus-flat claim is ServeProbe's ladder)
    "q95_serve_runs")

  /** `--wide`: the ENTIRE LLM tier (every registered query whose only
    * inputs are the documents/embeddings tables or the media lake
    * derived from them) — the "no scale-killer anywhere in the tier"
    * sweep, typically at 1×/10×. The store builds stay first so later
    * queries measure their own work, not the one-time installs.
    */
  private def wideQueries(registry: QRegistry): Seq[String] = {
    val tier = registry.queries.keys.filter { n =>
      val num = n.drop(1).takeWhile(_.isDigit).toInt
      (num >= 30 && num <= 69) ||
        // serve paths + r10 tier adds + the r11 BPE/search tiers +
        // the r12 shard/strip/curated-pack/served-tokenizer/NFC
        // additions
        // + the r13 escape-mode gates (93/94) and served runs (95)
        // + the r14 pretok gates (96/97), interchange round trip (98),
        //   PII redaction (99), surprisal (100), tf-idf (101), and
        //   mixture temperature (102)
        // + the r15 dHash lake (104-106), bigram LM serve (107), and
        //   SP unigram tokenizer (108/109)
        // + the r16 trigram stupid-backoff serve (110)
        Set(72, 73, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
          90, 91, 92, 93, 94, 95, 96, 97, 98, 99, 100, 101, 102, 103,
          104, 105, 106, 107, 108, 109, 110)
          .contains(num)
    }.toSeq.sorted
    val builds = Seq("q69_minhash_index_build", "q67_ivf_pq_index_build",
      "q104_media_dhash_build", "q108_sp_unigram_train")
    builds ++ tier.filterNot(builds.contains)
  }

  def main(args: Array[String]): Unit = {
    val wide = args.contains("--wide")
    val multArgs = args.filterNot(_.startsWith("--"))
    val mults: Seq[Int] =
      if (multArgs.nonEmpty) multArgs.toSeq.map(_.toInt) else Seq(1, 10)
    // fresh store root BEFORE the registry is built (each module
    // snapshots the prop once per instance): every probed build is
    // cold no matter what earlier runs left in the default root
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val storeRoot = s"${sys.props("java.io.tmpdir")}/graft-scale-index-$runId"
    sys.props("graft.index.dir") = storeRoot

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def num(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))

    val registry = new QRegistry(graft.config.Tuning.current)
    val queriesToProbe =
      if (wide) wideQueries(registry) else probeQueries

    // JIT/codegen warmup on a THROWAWAY tiny corpus (its lakes land in
    // the same fresh root but key by size+fingerprint, so they cannot
    // collide with a measured mult) — the first measured pass must not
    // be charged for JVM warmup.
    val warmDir = graft.operators.SyntheticCorpus.ensure(spark, 500, 200)
    queriesToProbe.foreach { q =>
      try registry.queries(q)(spark, warmDir).write
        .mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[probe] warmup $q failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    System.err.println(s"[probe] warmup done (500 docs / 200 vecs)")

    // mult → query → (pass1, pass2); a failed pass records NaN
    val results = mults.map { m =>
      val docs = 5000L * m
      val vecs = 2000L * m
      val g0 = System.nanoTime()
      val dir = graft.operators.SyntheticCorpus.ensure(spark, docs, vecs)
      val genS = (System.nanoTime() - g0) / 1e9
      System.err.println(
        s"[probe] mult $m: corpus $docs docs / $vecs vecs at $dir " +
          s"(ensure ${num(genS, 1)} s)")
      val times = queriesToProbe.map { q =>
        val passes = (1 to 2).map { pass =>
          val t0 = System.nanoTime()
          val ok =
            try {
              registry.queries(q)(spark, dir).write
                .mode("overwrite").format("noop").save()
              true
            } catch { case e: Throwable =>
              System.err.println(s"[probe] $q mult=$m pass=$pass failed: ${e.getMessage}")
              false
            }
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          if (ok) dt else Double.NaN
        }
        System.err.println(
          s"[probe] m=$m ${q.padTo(28, ' ')} pass1 ${num(passes(0), 2)} s  " +
            s"pass2 ${num(passes(1), 2)} s")
        q -> passes
      }
      m -> times.toMap
    }.toMap

    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[probe] spark.stop failed (ignored): ${e.getMessage}")
    }

    def short(k: String) = k.takeWhile(_ != '_')
    def jnum(v: Double): String = if (v.isNaN) "null" else num(v, 2)
    val sorted = mults.sorted
    val qJson = queriesToProbe.map { q =>
      val per = sorted.map { m =>
        val p = results(m)(q)
        s""""m$m":[${jnum(p(0))},${jnum(p(1))}]"""
      }.mkString(",")
      // α per adjacent step and pass, on the log10 of the mult ratio
      val alphas = sorted.sliding(2).collect { case Seq(a, b) =>
        val scale = math.log10(b.toDouble / a)
        val al = (0 to 1).map { i =>
          val (ta, tb) = (results(a)(q)(i), results(b)(q)(i))
          if (ta > 0 && !ta.isNaN && !tb.isNaN)
            math.log10(tb / ta) / scale
          else Double.NaN
        }
        s""""a${a}_$b":[${jnum(al(0))},${jnum(al(1))}]"""
      }.mkString(",")
      s""""${short(q)}":{$per,$alphas}"""
    }.mkString("{", ",", "}")
    println(
      s"""{"metric":"scale_probe","wide":$wide,"mults":[${sorted.mkString(",")}],""" +
        s""""docs_per_mult":5000,"vecs_per_mult":2000,"queries":$qJson}""")
    System.out.flush()
  }
}
