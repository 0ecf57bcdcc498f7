package graft.operators

import graft.{Q, Cols, Tables}
import Cols._
import Tables.t
import org.apache.spark.sql.{Column, DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanBridge

/** Dataset-assembly operators — the steps between a cleaned corpus and
  * a training run: deterministic train/val/test splitting, train→test
  * contamination detection, and sequence packing (concat-and-chunk into
  * fixed context windows). No reference analog (the reference stops at
  * ingest); these complete the LLM-pipeline surface next to the dedup
  * (q30-q36) and quality (q50-q56) tiers.
  */
/** The tuned assembly tier: one instance per knob set — the oracle SQL
  * interpolates THIS instance's `tuning` (see [[graft.QRegistry]]).
  */
final class Assemble(val tuning: graft.config.Tuning) extends Serializable {

  /** NFC-aware tokenization (the [[Dedup]] pattern) — contamination
    * shingles and packing token counts must key text exactly as the
    * dedup tier does under the same knobs.
    */
  private val nfcOn = tuning.normalizeNfc == 1
  private val toksExpr = Dedup.toksExprOf(nfcOn)
  private val toksSqlDuck = Dedup.toksSqlDuckOf(nfcOn)

  /** Deterministic hash split: md5-derived 60-bit hash of the doc id,
    * mod 100 → 80/10/10. Hash-based (not random) so the split is stable
    * under re-runs, insertions, and re-partitioning — the property a
    * reproducible training pipeline needs — and portable, so the oracle
    * assigns byte-identical splits.
    */
  private def splitBucket(idCol: Column): Column =
    md5Long(idCol.cast("string")) % 100
  private def splitBucketSql(idExpr: String): String =
    s"(${md5LongSql(s"CAST($idExpr AS VARCHAR)")}) % 100"

  /** Split assignment + per-split profile. One hash agg over a row-local
    * derived column: scale shape is a single shuffle of 3 rows.
    */
  private val q57 = Q(
    "q57_train_val_test_split",
    (s, d) => {
      import s.implicits._
      val b = splitBucket($"doc_id")
      t(s, d, "documents")
        .withColumn("split",
          when(b < 80, "train").when(b < 90, "val").otherwise("test"))
        .groupBy($"split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").cast("long").as("sum_chars"),
          r2(avg($"n_chars")).as("avg_chars"))
        .orderBy($"split")
    },
    Some(s"""
      WITH sp AS (SELECT n_chars,
                    CASE WHEN ${splitBucketSql("doc_id")} < 80 THEN 'train'
                         WHEN ${splitBucketSql("doc_id")} < 90 THEN 'val'
                         ELSE 'test' END AS split
                  FROM documents)
      SELECT split, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             round(avg(n_chars), 2) AS avg_chars
      FROM sp
      GROUP BY split
      ORDER BY split"""))

  /** Train→test contamination scan (the decontamination step of
    * large-corpus training runs): a test document is contaminated when
    * it shares an 8-gram with ANY train document. Grams are the same
    * compiled row-local shingles as q36 ([[Dedup.shinglePostings]]),
    * hashed to 60-bit longs so the existence join shuffles longs, not
    * strings. Scale shape: one distinct on train grams + one SEMI join
    * on the gram hash — existence only, so hot boilerplate grams cannot
    * explode into pairs (no DF cap needed, unlike the pairing joins).
    * Emits contaminated test docs with their hit ratio.
    */
  /** The shared train→test contamination pipeline behind q37 and q77.
    * `bloom = true` inserts the result-transparent sketch prescreen of
    * [[bloomPrescreen]] between the eval-side shingle stream and the
    * exact verify join.
    */
  private def contamination(s: SparkSession, d: String, bloom: Boolean): DataFrame = {
    import s.implicits._
    val ex = Dedup.shinglePostings(s, d, n = 8, nfc = nfcOn)
      .select($"doc_id", $"nsh", md5Long($"t").as("h"))
      .withColumn("b", splitBucket($"doc_id"))
      .cache()  // feeds BOTH join sides — uncached, the corpus would
                // be scanned + shingled + hashed twice
    val trainGrams = ex.filter($"b" < 80).select($"h").distinct()
    val eval0 = ex.filter($"b" >= 90)
    val evalSide = if (bloom) bloomPrescreen(trainGrams, eval0) else eval0
    evalSide
      .join(trainGrams, Seq("h"), "left_semi")
      .groupBy($"doc_id", $"nsh")
      .agg(count(lit(1)).as("n_hit"))
      .select($"doc_id",
        $"nsh".cast("long").as("n_grams"),
        $"n_hit".cast("long").as("n_hit"),
        r4($"n_hit" / $"nsh").as("hit_ratio"))
      .orderBy($"doc_id")
  }

  /** Bloom-filter prescreen: fold `train`'s `h` column into one
    * bloomBits-bit sketch and drop every `evalSide` row whose hash the
    * sketch rules out, BEFORE the verify join's shuffle. This is
    * Spark's own runtime-filter machinery
    * ([[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]] /
    * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * — the pair `InjectRuntimeFilter` plants beside shuffle joins)
    * promoted to a first-class operator step where the optimizer's own
    * heuristics wouldn't fire (the creation side here is itself a
    * derived aggregate, not a selective scan filter).
    *
    * Result-transparent by construction: a bloom filter has NO false
    * negatives, and the exact semi join downstream removes the false
    * positives — so q77 ≡ q37 byte-for-byte, and an undersized sketch
    * only costs verify work, never correctness. The sketch build is
    * map-side partial-aggregated (each task folds its partition into a
    * local filter, merges are bitwise ORs); the ONE driver-side
    * touchpoint is the finished sketch — bloomBits/8 bytes (1 MiB at
    * the default), bounded by the validated knob like the codebook
    * collects — re-entering the plan as a literal the filter evaluates
    * executor-side. At 100 TB the win is the point: the eval side's
    * shuffle volume drops by the non-contaminated fraction (typically
    * ≫ 99%) for one extra row-local pass.
    *
    * An EMPTY train side folds to a NULL sketch (Spark's zero-row
    * aggregate); `might_contain(NULL, h)` is NULL, so the filter drops
    * every row — same rows (none) as the verify join would keep.
    *
    * The sketch rides a SCALAR SUBQUERY, not a collected literal —
    * InjectRuntimeFilter's own shape. The first cut collected the
    * bytes and re-embedded them as a BinaryType literal: correct, but
    * a 1 MiB literal lands hex-rendered in EVERY plan string
    * (explain, listener events, error messages — measured 6 MB of
    * explain output), and the collect adds a driver round-trip. As a
    * subquery the aggregate executes inside the query, the plan text
    * carries a subquery reference, and the sketch bytes never touch
    * the driver path at all.
    */
  private[operators] def bloomPrescreen(train: DataFrame, evalSide: DataFrame): DataFrame = {
    val trainPlan = PlanBridge.analyzed(train)
    val h = trainPlan.output.find(_.name == "h").getOrElse(
      throw new IllegalArgumentException("bloomPrescreen: train side must expose a column `h`"))
    val items = math.max(1L, tuning.bloomBits / 16L)  // ~16 bits/item → fpp ≈ 4e-4
    val agg = new BloomFilterAggregate(h, Literal(items),
      Literal(tuning.bloomBits.toLong)).toAggregateExpression()
    val sketch = ScalarSubquery(
      Aggregate(Nil, Seq(Alias(agg, "bf")()), trainPlan))
    evalSide.filter(GraftShims.toColumn(BloomFilterMightContain(
      sketch, GraftShims.toExpression(col("h")))))
  }

  private val contaminationOracle = s"""
      WITH toks AS (SELECT doc_id, $toksSqlDuck AS toks FROM documents),
      sh AS (SELECT doc_id,
               list_distinct(list_transform(range(1, greatest(len(toks) - 6, 1)),
                 i -> array_to_string(list_slice(toks, i, i + 7), ' '))) AS sh
             FROM toks WHERE len(toks) >= 8),
      ex AS (SELECT doc_id, len(sh) AS nsh,
               CAST('0x' || substr(md5(unnest(sh)), 1, 15) AS BIGINT) AS h
             FROM sh),
      sp AS (SELECT doc_id, nsh, h, ${splitBucketSql("doc_id")} AS b FROM ex),
      tr AS (SELECT DISTINCT h FROM sp WHERE b < 80),
      hits AS (SELECT doc_id, nsh, count(*) AS n_hit
               FROM sp
               WHERE b >= 90 AND h IN (SELECT h FROM tr)
               GROUP BY doc_id, nsh)
      SELECT doc_id, CAST(nsh AS BIGINT) AS n_grams,
             CAST(n_hit AS BIGINT) AS n_hit,
             round(n_hit / CAST(nsh AS DOUBLE), 4) AS hit_ratio
      FROM hits
      ORDER BY doc_id"""

  private val q37 = Q(
    "q37_contamination",
    (s, d) => contamination(s, d, bloom = false),
    Some(contaminationOracle))

  /** q37 behind the bloom prescreen ([[bloomPrescreen]]) — the scale
    * path of the contamination scan. Same oracle VERBATIM: the sketch
    * is result-transparent (no false negatives; false positives die in
    * the exact verify join), so the gate checks the transparency claim
    * itself, byte-for-byte, every round.
    */
  private val q77 = Q(
    "q77_contamination_bloom",
    (s, d) => contamination(s, d, bloom = true),
    Some(contaminationOracle))

  /** Sequence packing (concat-and-chunk): documents are concatenated in
    * doc_id order and cut into fixed 512-token context windows; a doc
    * belongs to the bin where it STARTS. Per bin: docs, tokens, id span
    * — the shape of a pretraining batch manifest.
    *
    * The global token prefix-sum uses the same range-partitioned
    * two-pass pattern as q22 (per-partition token totals → global
    * offsets → local running sums), NOT a global `ORDER BY` window —
    * the window form funnels the whole corpus through one reducer. The
    * partitioning is cache-pinned so both passes see identical
    * boundaries (RangePartitioner samples with an RDD-id-derived seed).
    */
  private val q58 = Q(
    "q58_sequence_packing",
    (s, d) => {
      import s.implicits._
      val ctx = 512L
      val ranged = TwoPass.rangedPinned(
        t(s, d, "documents")
          .select($"doc_id",
            when($"text".isNull, 0L)
              .otherwise(size(expr(toksExpr)).cast("long")).as("n"))
          .as[(Long, Long)],
        $"doc_id")
      // pass 1: per-partition token totals — P scalars to the driver
      val sums = TwoPass.withPid(ranged) { (pid, it) =>
        var tot = 0L
        it.foreach { case (_, n) => tot += n }
        Iterator.single((pid, tot))
      }.collect()
      // pid-sorted prefix scan (O(P log P)), not a rescan per entry
      val offsets: Map[Int, Long] = {
        var running = 0L
        sums.sortBy(_._1).map { case (pid, tot) =>
          val off = running; running += tot; pid -> off
        }.toMap
      }
      val bOff = s.sparkContext.broadcast(offsets)
      // pass 2: a doc's start offset = partition offset + tokens before
      // it locally; its bin is start / ctx
      val binned = TwoPass.withPid(ranged) { (pid, it) =>
        var run = bOff.value.getOrElse(pid, 0L)
        it.map { case (id, n) =>
          val start = run
          run += n
          (id, n, start / ctx)
        }
      }.toDF("doc_id", "n", "bin")
      binned.groupBy($"bin")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n").cast("long").as("n_tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"bin")
    },
    Some(s"""
      WITH c AS (SELECT doc_id,
                   CASE WHEN text IS NULL THEN 0
                        ELSE CAST(len($toksSqlDuck) AS BIGINT) END AS n
                 FROM documents),
      w AS (SELECT doc_id, n,
              coalesce(sum(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
            FROM c),
      b AS (SELECT doc_id, n, CAST(strt // 512 AS BIGINT) AS bin FROM w)
      SELECT bin, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM b
      GROUP BY bin
      ORDER BY bin"""))

  /** Per-source quota sampling — the "cap documents per domain" step of
    * corpus assembly: keep a deterministic sample of at most 20 docs per
    * source, chosen by smallest doc-id hash (stable under re-runs and
    * insertions, like q57's split). The selection reuses
    * [[graft.functions.KMinValues]]: 20 longs of state per source,
    * map-side partials, then a semi join brings back the winning rows —
    * no per-source window sort, so a source with 10⁹ docs at 100 TB
    * costs the same aggregate state as one with 10³. (Hash ties across
    * docs within a source are a ~2⁻⁶⁰ md5 collision — the same
    * distinctness assumption the LSH tiers rest on.)
    */
  private val q59 = Q(
    "q59_source_quota_sample",
    (s, d) => {
      import s.implicits._
      val quota = tuning.sourceQuota
      val withH = t(s, d, "documents")
        .select($"doc_id", $"source",
          md5Long($"doc_id".cast("string")).as("h"))
        .cache()  // feeds BOTH the aggregate and the semi-join probe —
                  // uncached, the corpus would be scanned + hashed twice
      val kept = withH.groupBy($"source")
        .agg(graft.functions.KMinValues.kMinValues($"h", quota).as("mins"))
        .select($"source".as("k_source"), explode($"mins").as("k_h"))
      // <=> on source: a NULL source is a legitimate quota group (the
      // oracle's PARTITION BY groups NULLs together) — a null-unsafe
      // equi join would silently drop every NULL-source doc
      withH.join(kept,
          withH("source") <=> kept("k_source") && withH("h") === kept("k_h"),
          "left_semi")
        .select($"source", $"doc_id")
        .orderBy($"source", $"doc_id")
    },
    Some(s"""
      WITH h AS (SELECT doc_id, source,
                   ${md5LongSql("CAST(doc_id AS VARCHAR)")} AS h
                 FROM documents),
      r AS (SELECT source, doc_id,
              row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
            FROM h)
      SELECT source, doc_id
      FROM r WHERE rn <= ${tuning.sourceQuota}
      ORDER BY source, doc_id"""))

  /** Mixture rebalancing — the data-dependent generalization of q59's
    * fixed cap: each source keeps ⌈√n⌉ documents (capped at 64), so a
    * domain with 10⁶ docs contributes 10³ while a 100-doc domain keeps
    * 10 — the standard sub-linear flattening of a heavy-tailed source
    * distribution when assembling a training mix (one boilerplate-heavy
    * giant domain must not drown the long tail). Selection is the same
    * deterministic smallest-hash rule as q59 (stable under re-runs and
    * insertions); state per source is one bounded k-min aggregate at
    * the GLOBAL cap plus a count, so the hot-domain cost argument is
    * unchanged. The √-law and the 64 cap use the same ε-guarded ceil on
    * both engines; the kept prefix of the k-min array is sliced to the
    * per-source quota after the aggregate, which is why a single global
    * k works for data-dependent quotas.
    */
  private val q39 = Q(
    "q39_source_mixture",
    (s, d) => {
      import s.implicits._
      val capK = 64
      val withH = t(s, d, "documents")
        .select($"doc_id", $"source",
          md5Long($"doc_id".cast("string")).as("h"))
        .cache()  // aggregate + semi-join probe, as q59
      val kept = withH.groupBy($"source")
        .agg(graft.functions.KMinValues.kMinValues($"h", capK).as("mins"),
          count(lit(1)).as("n"))
        .withColumn("quota",
          least(lit(capK.toLong),
            ceil(sqrt($"n".cast("double")) - 1e-9).cast("long")))
        .select($"source".as("k_source"), $"quota",
          posexplode($"mins"))
        .filter($"pos" < $"quota")
        .select($"k_source", $"col".as("k_h"))
      withH.join(kept,
          withH("source") <=> kept("k_source") && withH("h") === kept("k_h"),
          "left_semi")
        .select($"source", $"doc_id")
        .orderBy($"source", $"doc_id")
    },
    Some(s"""
      WITH h AS (SELECT doc_id, source,
                   ${md5LongSql("CAST(doc_id AS VARCHAR)")} AS h
                 FROM documents),
      n AS (SELECT source, count(*) AS n FROM h GROUP BY source),
      dh AS (SELECT DISTINCT source, h FROM h),
      r AS (SELECT dh.source, dh.h,
              row_number() OVER (PARTITION BY dh.source ORDER BY dh.h) AS rn,
              n.n
            FROM dh JOIN n ON dh.source IS NOT DISTINCT FROM n.source),
      kept AS (SELECT source, h FROM r
               WHERE rn <= least(64, CAST(ceil(sqrt(n) - 1e-9) AS BIGINT)))
      SELECT h.source, h.doc_id
      FROM h JOIN kept ON h.source IS NOT DISTINCT FROM kept.source
                      AND h.h = kept.h
      ORDER BY h.source, h.doc_id"""))

  /** q102: temperature-based mixture reweighting — the sampling-weight
    * arithmetic behind multilingual/multi-source training mixes
    * (PaLM/LLaMA style): per-source token shares p_i are flattened to
    * w_i ∝ p_i^α (α = 0.7 — the published multilingual default; α = 1
    * is proportional, α = 0 uniform), and each source's expected
    * EPOCHS under a two-total-corpus-pass token budget is
    * w_i · B / t_i with B = 2·Σt — the number a mixture designer
    * actually reads (an epoch count ≫ 1 flags upsampling-driven
    * memorization risk on small sources). All arithmetic happens on
    * one source-count aggregate (20 rows here, O(sources) anywhere);
    * the only corpus-sized work is the token count, one
    * map-side-combinable aggregate. Engine parity: both engines
    * compute pow on identical doubles derived from exact integer
    * counts; only the FINAL columns round (r6/r4), the house float
    * contract.
    */
  private val q102 = Q(
    "q102_mixture_temperature",
    (s, d) => {
      import s.implicits._
      val counts = t(s, d, "documents")
        .select($"source", explode(expr(toksExpr)).as("tok"))
        .groupBy($"source").agg(count(lit(1)).as("n_tokens"))
        .cache() // the scalar totals and the final projection share it
      val tot = counts.agg(coalesce(sum($"n_tokens"), lit(0L)))
        .as[Long].head().toDouble
      val zAgg = counts
        .agg(sum(pow($"n_tokens" / lit(tot), 0.7))).as[Double].head()
      counts
        .withColumn("raw_share", $"n_tokens" / lit(tot))
        .withColumn("weight", pow($"raw_share", 0.7) / lit(zAgg))
        .select($"source", $"n_tokens",
          r6($"raw_share").as("raw_share"),
          r6($"weight").as("weight"),
          // left-to-right as the oracle spells it (weight * 2.0 * t /
          // n_tokens): pre-multiplying 2.0·tot on the driver associates
          // the floats differently — a 1-ULP parity hazard under the
          // exact-hash gate
          r4($"weight" * lit(2.0) * lit(tot) / $"n_tokens").as("epochs"))
        .orderBy($"source")
    },
    Some(s"""
      WITH c AS (SELECT source, count(*) AS n_tokens
                 FROM (SELECT source, unnest($toksSqlDuck) AS tok
                       FROM documents)
                 GROUP BY source),
      tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS t FROM c),
      z AS (SELECT sum(pow(n_tokens / (SELECT t FROM tot), 0.7)) AS z
            FROM c),
      w AS (SELECT source, n_tokens,
              n_tokens / (SELECT t FROM tot) AS raw_share,
              pow(n_tokens / (SELECT t FROM tot), 0.7) / (SELECT z FROM z)
                AS weight
            FROM c)
      SELECT source, n_tokens,
             round(raw_share, 6) AS raw_share,
             round(weight, 6) AS weight,
             round(weight * 2.0 * (SELECT t FROM tot) / n_tokens, 4)
               AS epochs
      FROM w
      ORDER BY source"""))

  val all: Seq[Q] = Seq(q37, q57, q58, q59, q39, q77, q102)
}
