package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Four-decade ladder for the SEARCH serving faces — the two stores
  * the wide sweep covers only at fixed scale: the runs positional
  * postings ([[graft.operators.Search!.serveRuns]]) and the BM25
  * inverted index ([[graft.operators.Search!.serveBm25]]). The probe
  * corpus is the RICH-vocabulary generator (50k-word Zipf-ish
  * lexicon), not the 31-word testdata mix: an inverted index over 31
  * words has only stopword posting lists, which would misattribute
  * the prune's value.
  *
  * Cells per mult (5000·m docs), each two passes — pass 1 of a
  * family's first cell carries the COLD store build, pass 2 (and the
  * later cells) the steady serve:
  *  - `runs`: a PINNED 32-doc corpus-replay batch against the stored
  *    postings — ~3.3k distinct window hashes, inside the literal
  *    h-prune path (the production shape: incoming batch vs corpus);
  *  - `bmhead`: 8 HEAD-rank terms (the dense posting lists — serve
  *    cost is their df, which grows with the corpus: the honest
  *    stopword bound, expected α ≈ 1 but far below a corpus re-scan);
  *  - `bmtail`: 8 TAIL-rank terms (sparse lists — the prune claim:
  *    the scan reads the touched slices, never the corpus);
  *  - `surprisal`: the same pinned batch against the stored corpus
  *    LM ([[graft.operators.TextOps!.serveSurprisal]] — the corpus-LM
  *    quality scorer joins the ladder with the other serve faces;
  *    pass 1 of the first cell carries the cold LM build, which since
  *    r15 includes the corpus bigram table);
  *  - `surprisal2`: the same batch at order 2 — the bigram
  *    interpolation adds the (prev, tok) join against the
  *    corpus-sized bigram counts, the cell that would expose a
  *    corpus-proportional serve term if the join stopped pruning;
  *  - `dhash`: 32 media documents replayed (shifted ids) against the
  *    stored perceptual-hash band index
  *    ([[graft.operators.MediaDedup!.serveDhashMatches]]) — pass 1 of
  *    the first cell carries the media-fixture generation AND the
  *    cold decode→dHash lake build; steady serve is the probe-side
  *    decode + the capped band join.
  *
  * α = log10(t_big/t_small) per 10× step, per pass. Usage:
  * `scripts/run.sh graft.ServeProbe [mult ...]` (default 1 10 100
  * 1000). One JSON line on stdout; verbose timing on stderr.
  */
object ServeProbe {

  private val lexicon = 50000
  private val headTerms = (0L until 8L).map(operators.SyntheticCorpus.synthWord)
  private val tailTerms =
    (lexicon - 9L until lexicon - 1L).map(operators.SyntheticCorpus.synthWord)

  def main(args: Array[String]): Unit = {
    val mults: Seq[Int] =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 100, 1000)
    // fresh store root: every probed build is cold (the ScaleProbe rule)
    val runId = java.util.UUID.randomUUID().toString.take(8)
    sys.props("graft.index.dir") =
      s"${sys.props("java.io.tmpdir")}/graft-serve-index-$runId"

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serve-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def num(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))

    val search = new operators.Search(config.Tuning.current)
    val textOps = new operators.TextOps(config.Tuning.current)
    val mediaDedup = new operators.MediaDedup(config.Tuning.current)

    def probeBatch(dir: String) = spark.read
      .parquet(s"$dir/documents.parquet")
      .where(col("doc_id") < 32)
      .select((col("doc_id") + 900000000L).as("id"), col("text"))

    def mediaProbe(dir: String) = operators.Multimodal.MediaLake
      .table(spark, dir)
      .where(col("doc_id") < 32)
      .select((col("doc_id") + 900000000L).as("doc_id"), col("blob"))

    // the LARGE-probe batch (r17, the localCheckpoint audit): a FIXED
    // 100k-document frame — past the serve's collect cap, so the
    // n-gram prune takes the distributed semi-join fallback — served
    // against every decade's store. The serve-side localCheckpoint
    // materializes the PROBE tokens, so the cell must stay
    // corpus-flat; a corpus-proportional term here would be the
    // materialization leak the audit exists to catch.
    lazy val bigProbeDir = operators.SyntheticCorpus
      .ensureText(spark, 100000L, lexicon)
    def bigProbe = spark.read
      .parquet(s"$bigProbeDir/documents.parquet")
      .select((col("doc_id") + 800000000L).as("id"), col("text"))

    // the dHash large probe: 2000 stored blobs replayed under fresh
    // ids — the probe-side decode dominates; the serve-side
    // localCheckpoint holds 2000 signatures whatever the corpus size
    def bigMediaProbe(dir: String) = operators.Multimodal.MediaLake
      .table(spark, dir)
      .where(col("doc_id") < 2000)
      .select((col("doc_id") + 800000000L).as("doc_id"), col("blob"))

    def cells(dir: String): Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "runs" -> (() => search.serveRuns(spark, dir, probeBatch(dir))),
      "bmhead" -> (() => search.serveBm25(spark, dir, headTerms, 20)),
      // r16: the single-term hot path — the head-term top-K cache
      // answers a base-only 1-term probe from ≤ headK stored rows
      // (expected corpus-FLAT, vs bmhead's documented df-bound)
      "bmhot" -> (() => search.serveBm25(spark, dir, Seq(headTerms.head), 20)),
      "bmtail" -> (() => search.serveBm25(spark, dir, tailTerms, 20)),
      // the served LM scorer — pass 1 of the first cell carries the
      // cold corpus-LM build (token count + bigram count), the steady
      // passes a batch-sized probe against the broadcast counts
      "surprisal" -> (() => textOps.serveSurprisal(spark, dir, probeBatch(dir))),
      // r15: the bigram mode — adds the (prev, tok) join against the
      // corpus-sized bigram table (store already built by `surprisal`)
      "surprisal2" -> (() => textOps.serveSurprisal(spark, dir, probeBatch(dir), order = 2)),
      // r16: the trigram stupid-backoff mode — adds the (p2, prev,
      // tok) join against the bucketed trigram table, pruned by the
      // same collected prev set as the bigram scan
      "surprisal3" -> (() => textOps.serveSurprisal(spark, dir, probeBatch(dir), order = 3)),
      // r17: the order-5 chain — two more bucketed joins (4/5-gram),
      // all pruned by the one collected prev set
      "surprisal5" -> (() => textOps.serveSurprisal(spark, dir, probeBatch(dir), order = 5)),
      // r17: the LARGE-probe audit cells (see bigProbe above) — must
      // stay corpus-flat: the only localCheckpoint on these paths is
      // the probe-sized frame
      "bigsurp3" -> (() => textOps.serveSurprisal(spark, dir, bigProbe, order = 3)),
      "bigdhash" -> (() => mediaDedup.serveDhashMatches(spark, dir, bigMediaProbe(dir))),
      // r15: the perceptual-dedup serve — pass 1 of the first cell
      // carries media-fixture generation + the decode→dHash lake build
      "dhash" -> (() => mediaDedup.serveDhashMatches(spark, dir, mediaProbe(dir))))

    // JIT warmup on a throwaway corpus (keyed by size — no collision)
    val warm = operators.SyntheticCorpus.ensureText(spark, 500, lexicon)
    cells(warm).foreach { case (n, f) =>
      try f().write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[serve-probe] warmup $n failed: ${e.getMessage}")
      }
    }
    System.err.println("[serve-probe] warmup done (500 docs)")

    val results: Map[Int, Map[String, Seq[Double]]] = mults.map { m =>
      val docs = 5000L * m
      val g0 = System.nanoTime()
      val dir = operators.SyntheticCorpus.ensureText(spark, docs, lexicon)
      System.err.println(s"[serve-probe] mult $m: $docs docs at $dir " +
        s"(ensure ${num((System.nanoTime() - g0) / 1e9, 1)} s)")
      val times = cells(dir).map { case (name, f) =>
        val passes = (1 to 2).map { pass =>
          val t0 = System.nanoTime()
          val ok =
            try { f().write.mode("overwrite").format("noop").save(); true }
            catch { case e: Throwable =>
              System.err.println(
                s"[serve-probe] $name m=$m pass=$pass failed: ${e.getMessage}")
              false
            }
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          if (ok) dt else Double.NaN
        }
        System.err.println(s"[serve-probe] m=$m ${name.padTo(8, ' ')} " +
          s"pass1 ${num(passes(0), 2)} s  pass2 ${num(passes(1), 2)} s")
        name -> passes
      }.toMap
      m -> times
    }.toMap

    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[serve-probe] spark.stop failed (ignored): ${e.getMessage}")
    }

    def jnum(v: Double): String = if (v.isNaN) "null" else num(v, 2)
    val sorted = mults.sorted
    val names = Seq("runs", "bmhead", "bmhot", "bmtail", "surprisal",
      "surprisal2", "surprisal3", "surprisal5", "bigsurp3", "bigdhash",
      "dhash")
    val qJson = names.map { q =>
      val per = sorted.map { m =>
        val p = results(m)(q)
        s""""m$m":[${jnum(p(0))},${jnum(p(1))}]"""
      }.mkString(",")
      val alphas = sorted.sliding(2).collect { case Seq(a, b) =>
        val scale = math.log10(b.toDouble / a)
        val al = (0 to 1).map { i =>
          val (ta, tb) = (results(a)(q)(i), results(b)(q)(i))
          if (ta > 0 && !ta.isNaN && !tb.isNaN) math.log10(tb / ta) / scale
          else Double.NaN
        }
        s""""a${a}_$b":[${jnum(al(0))},${jnum(al(1))}]"""
      }.mkString(",")
      s""""$q":{${Seq(per, alphas).filter(_.nonEmpty).mkString(",")}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"serve_probe","mults":[${sorted.mkString(",")}],""" +
      s""""docs_per_mult":5000,"lexicon":$lexicon,"queries":$qJson}""")
    System.out.flush()
  }
}
