package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The saturation-decade counter-measures probe: q38's m1000 cell
  * measured 95.6M LSH candidate pairs (99.8% spurious) — survivable
  * only through the 12-pass verify budget. Round 12 shipped two cuts
  * at the root, and this probe measures both on the SAME corpus:
  *
  *  - **boilerplate strip** ([[graft.operators.Search#stripRuns]]):
  *    the corpus with its ≥runMinTokens shared literal runs removed,
  *    materialized as a documents table, then the candidate stage
  *    re-counted and q38 re-run over it;
  *  - **band-bucket cap** ([[graft.config.Tuning.bandBucketCap]]):
  *    the raw corpus with oversized band buckets dropped before
  *    pairing, same two measurements.
  *
  * Reported per cell: LSH candidate-pair count
  * ([[graft.operators.Dedup#candidateCount]]) and the full q38
  * wall-clock. A cell whose candidates sit under
  * [[graft.config.Tuning.verifyPairBudget]] runs its exact verify in
  * ONE pass — the budget machinery never engages.
  *
  * Usage: `scripts/run.sh graft.StripProbe [mult] [cap]` (default
  * `1000 16` — the saturation decade, 5M docs). The stored-index root
  * is pinned to a persistent dir so repeated probe runs reuse the
  * fingerprint-keyed artifacts.
  */
object StripProbe {

  def main(args: Array[String]): Unit = {
    val capOnly = args.contains("--cap-only")
    val pos = args.filterNot(_.startsWith("--"))
    val mult = if (pos.length > 0) pos(0).toInt else 1000
    val cap = if (pos.length > 1) pos(1).toInt else 16
    sys.props("graft.index.dir") =
      s"${sys.props("java.io.tmpdir")}/graft-strip-index"

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-strip-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def timed[A](label: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(s"[strip-probe] $label: ${num(dt)} s")
      (a, dt)
    }

    val docs = 5000L * mult
    val dir = graft.operators.SyntheticCorpus.ensure(spark, docs, 2000L * mult)
    System.err.println(s"[strip-probe] corpus $docs docs at $dir")

    val t = graft.config.Tuning.current
    val dedup = new graft.operators.Dedup(t)

    // cell 1: RAW candidate mass (bands build reused when installed)
    val (rawCand, rawCandS) = timed("raw candidateCount")(
      dedup.candidateCount(spark, dir))
    spark.catalog.clearCache()

    // cell 2 (skipped under --cap-only): STRIPPED corpus — materialize
    // stripRuns as a documents table (all original columns, n_chars
    // recomputed), then re-count and run the full q38 over it
    // keyed on the strip-SHAPING knobs too (runMinTokens/dfCap change
    // which spans are cut — a re-run under different tuning must not
    // reuse a stale stripped corpus; the Bpe.curatedShardsPath rule)
    // AND on the source generator's version (a SyntheticCorpus bump
    // regenerates the raw corpus, so the stripped twin must re-key
    // with it rather than serve a stale strip of the old bytes)
    val stripDir = s"${graft.operators.SyntheticCorpus.defaultRoot}/" +
      s"stripped-v1-g${graft.operators.SyntheticCorpus.version}" +
      s"-d$docs-r${t.runMinTokens}-c${t.dfCap}"
    val (stripS, strippedCand, strippedCandS, strippedQ38S) =
      if (capOnly) (Double.NaN, -1L, Double.NaN, Double.NaN)
      else {
        val (_, sS) = timed("strip + materialize") {
          graft.operators.SyntheticCorpus.ensureDir(stripDir) { staging =>
            val stripped = new graft.operators.Search(t).stripRuns(spark, dir)
            graft.Tables.t(spark, dir, "documents")
              .drop("text", "n_chars")
              .join(stripped, Seq("doc_id"))
              .withColumn("n_chars", length(col("text")).cast("long"))
              .select("doc_id", "text", "lang", "source", "n_chars")
              .write.mode("overwrite")
              .parquet(s"${staging.getAbsolutePath}/documents.parquet")
          }
        }
        spark.catalog.clearCache()
        val (sc, scS) = timed("stripped candidateCount")(
          dedup.candidateCount(spark, stripDir))
        spark.catalog.clearCache()
        val (_, sqS) = timed("stripped q38") {
          new QRegistry(t).queries("q38_dedup_components")(spark, stripDir)
            .write.mode("overwrite").format("noop").save()
        }
        spark.catalog.clearCache()
        (sS, sc, scS, sqS)
      }

    // cell 3: CAPPED raw corpus — same band lake, tighter pairing gate
    val capped = new graft.operators.Dedup(t.copy(bandBucketCap = cap))
    val (cappedCand, cappedCandS) = timed(s"capped($cap) candidateCount")(
      capped.candidateCount(spark, dir))
    spark.catalog.clearCache()
    val (_, cappedQ38S) = timed(s"capped($cap) q38") {
      new QRegistry(t.copy(bandBucketCap = cap))
        .queries("q38_dedup_components")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }

    try spark.stop() catch { case _: Exception => }

    val budget = t.verifyPairBudget
    def passes(c: Long): Long = math.max(1L, (c + budget - 1) / budget)
    def jn(v: Double): String = if (v.isNaN) "null" else num(v)
    def jc(c: Long): String = if (c < 0) "null" else c.toString
    def jp(c: Long): String = if (c < 0) "null" else passes(c).toString
    println(
      s"""{"metric":"strip_probe","mult":$mult,"docs":$docs,""" +
        s""""verify_pair_budget":$budget,"band_bucket_cap":$cap,""" +
        s""""raw_candidates":$rawCand,"raw_cand_s":${num(rawCandS)},""" +
        s""""raw_verify_passes":${passes(rawCand)},""" +
        s""""strip_materialize_s":${jn(stripS)},""" +
        s""""stripped_candidates":${jc(strippedCand)},"stripped_cand_s":${jn(strippedCandS)},""" +
        s""""stripped_verify_passes":${jp(strippedCand)},""" +
        s""""stripped_q38_s":${jn(strippedQ38S)},""" +
        s""""capped_candidates":$cappedCand,"capped_cand_s":${num(cappedCandS)},""" +
        s""""capped_verify_passes":${passes(cappedCand)},""" +
        s""""capped_q38_s":${num(cappedQ38S)}}""")
    System.out.flush()
  }
}
