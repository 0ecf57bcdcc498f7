package graft.config

/** Quality knobs for the batch dedup/ANN/assembly tier — the X5
  * config-compiled-pipeline pattern (readport.py:536-584, realized for
  * streaming by [[DeviceConfig]]) applied to the batch surface: every
  * dial a corpus-curation user tunes per dataset is a validated config
  * value with the shipped default, not a source-edit.
  *
  * Loaded ONCE at class initialization from system properties
  * (`-Dgraft.tuning.<knob>=<int>`) with an environment fallback
  * (`GRAFT_TUNING_<KNOB>` in SCREAMING_SNAKE), because the paired
  * DuckDB oracle SQL strings interpolate the same instance at operator
  * registry load: a tuned run stays hash-checkable end-to-end, and a
  * mid-session mutation would silently desynchronize the two engines.
  * Invalid values fail fast with a [[ConfigurationError]], the same
  * load-time contract as the streaming config.
  */
final case class Tuning(
    /** q31: max documents a shingle may appear in before its posting
      * list is dropped as corpus boilerplate (bounds pair volume at
      * dfCap² per shingle). */
    dfCap: Int = 100,
    /** q32: LSH band count over the minhash signature. */
    minhashBands: Int = 8,
    /** q32: minhash rows per band; signature size = bands × rows. */
    minhashRows: Int = 2,
    /** q32: max documents per band bucket before the bucket is dropped
      * as non-discriminative. */
    minhashBucketCap: Int = 100,
    /** q41: number of independent sign-LSH hyperplane tables whose
      * bucket candidates are unioned (the standard LSH recall knob —
      * recall = 1-(1-p^bits)^tables at ~tables× the pairing cost). */
    lshTables: Int = 4,
    /** q41/q34: max vectors per sign bucket before the bucket is
      * dropped whole (sign-degenerate skew guard). */
    lshBucketCap: Int = 512,
    /** q44: IVF cells probed per query (the IVF recall knob). */
    nprobe: Int = 16,
    /** q43/q44/q45: deterministic k-means refinement passes over the
      * seed codebook. */
    lloydIters: Int = 2,
    /** q59: max documents kept per source. */
    sourceQuota: Int = 20,
    /** q29: k-minimum-values sketch size (distinct-count state bound
      * per group). */
    kmvK: Int = 256,
    /** q40/q45/q48/q49: ANN query-set size — queries are the vectors
      * with `vec_id < annQueries`. 100 gives q45's recall@1 a 0.01
      * granularity (10 distinguished only 11 levels and one boundary
      * query flipped a tier by 0.1); the query side stays
      * broadcast-small, so cost grows ~linearly. */
    annQueries: Int = 100,
    /** q38: rounded-Jaccard threshold for a near-dup edge. */
    ccEdgeJaccard: Double = 0.5,
    /** q47/q48/q49: PQ subspace count cap (effective subspaces =
      * min(this, ceil(dim / pqSubDim))). */
    pqSubspaces: Int = 8,
    /** q47/q48/q49: dimensions per PQ subspace. */
    pqSubDim: Int = 8,
    /** q47/q48/q49: centroids per PQ subspace (seed stride = n / this).
      * FAISS's standard 8-bit codebook (256) — measured at sf0.1 on the
      * worst-case uniform-random embeddings: 16 centroids left the
      * refined tier at 0.4 recall@1, 256 reaches multiprobe's 0.8. */
    pqCentroids: Int = 256,
    /** q45/q49: exact re-rank candidate multiplier — the refined search
      * re-scores the top `refineFactor × k` ADC candidates with exact
      * float cosine (FAISS's refine step). 64 (R = 320 of the ~nprobe·√n
      * candidates) is the measured knee at annQueries = 100 where
      * refined recall@1 reaches the candidate-coverage bound (=
      * multiprobe's 0.80 at sf0.1); 16 left two queries' true NN below
      * the ADC shortlist. The refine join stays nq·R broadcast pairs —
      * raising it is cheap. */
    refineFactor: Int = 64,
    /** Delta-store compaction trigger: after a DML install, the store
      * folds its segments into a new generation when the UNCONSUMED
      * count (adds + tombstones) exceeds this — the WAL's bounded-
      * segment pattern applied to the delta lakes, so a long-lived
      * store's per-serve union list stays bounded without an operator
      * remembering to call compact(). Folding is additive (nothing
      * deleted — vacuum stays the explicit maintenance-window step).
      * 64 keeps steady micro-batch ingest to ~one fold per 64 batches
      * while every serve unions at most 64 segment reads + one
      * generation + the base. */
    storeMaxSegments: Int = 64,
    /** q77: bloom-filter size in BITS for the contamination prescreen
      * sketch. The sketch is the one driver-side touchpoint of the
      * operator (bloomBits/8 bytes collected then re-broadcast as a
      * plan literal); 2²³ bits = 1 MiB holds ~0.5 M train shingles at
      * ~16 bits/item (fpp ≈ 4·10⁻⁴). Sizing is a pure work/space
      * trade: an undersized sketch only raises the false-positive
      * rate (more rows surviving to the exact verify join), never
      * wrongness — there are no false negatives. Capped at 2²⁶ =
      * Spark's own runtime-filter numBits ceiling. */
    bloomBits: Int = 1 << 23,
    /** q78: outliers reported per label — the k farthest-from-centroid
      * vectors. Bounds the per-group aggregate state (k longs) and the
      * result size (labels × k rows). */
    outlierK: Int = 10,
    /** q32/q38/q81: max LSH candidate pairs per exact-verify pass. A
      * saturated corpus (boilerplate-heavy, low-entropy vocabulary)
      * can emit candidate mass far beyond what one node's shuffle
      * spill space absorbs in a single join — the measured fourth-
      * decade failure mode; over this budget the verify runs as
      * ⌈candidates / budget⌉ deterministic hash-partitioned passes,
      * each materialized before the next starts, so the failure mode
      * is bounded extra passes, never a dead job. Results are
      * bit-identical to the single-pass plan (a pure partition of the
      * candidate set). 8M pairs ≈ tens of GB of spill per pass at
      * typical shingle-array widths. */
    verifyPairBudget: Int = 8000000,
    /** q82/q83: BPE merge rounds to train. Each round is one bounded
      * aggregation over the VOCABULARY table (not the corpus) plus a
      * 1-row driver collect — the q38 fixpoint pattern; training may
      * stop early when no adjacent pair repeats (count < 2). */
    bpeMerges: Int = 40,
    /** q82/q83/q84: deterministic corpus-sample modulus for BPE
      * TRAINING — the vocabulary is built from documents with
      * `doc_id % bpeSampleMod = 0` (1 = the whole corpus, the shipped
      * default). Sampling is how production tokenizer trainers bound
      * cost at corpus scale: the merge table trains on the sample's
      * vocabulary, while tokenization (q83) and packing (q84) still
      * apply the trained merges to EVERY document's words — exactly how
      * a trained tokenizer meets unseen text. Mirrored in the oracle
      * SQL (a sampled run stays hash-checkable), matrix-tested like
      * dfCap because it changes results. */
    bpeSampleMod: Int = 1,
    /** q82-q91: BPE training-vocabulary FREQUENCY FLOOR — words seen
      * fewer than this many times in the (sampled) training corpus are
      * dropped from the training vocabulary (1 = off, the shipped
      * default). This is the standard production bound on trainer
      * memory (HuggingFace `min_frequency`): a real web corpus's word
      * types are mostly hapax tail (typos, URLs, numerics) that
      * contribute ~nothing to the first 32k merges, and without a
      * floor the [[graft.operators.Bpe!.trainLocalMerges]] driver
      * collect is corpus-vocabulary-sized. Application surfaces
      * (q83/q84 token counts, serving) still segment EVERY word with
      * the trained merges — the floor bounds what trains, not what
      * tokenizes. Mirrored in the oracle's vocabulary CTE;
      * matrix-tested like dfCap because it changes results. */
    bpeMinFreq: Int = 1,
    /** q82-q91: BPE training-vocabulary TOP-K CAP — after the
      * frequency floor, keep only the `bpeVocabCap` most frequent
      * words (ties broken by word ascending, the engines' shared
      * binary collation; 0 = off, the shipped default). The hard
      * driver-memory bound for [[graft.operators.Bpe!.trainLocalMerges]]:
      * whatever the corpus, the collected vocabulary is ≤ this many
      * rows. Same train-only scope and oracle mirroring as
      * [[bpeMinFreq]]. */
    bpeVocabCap: Int = 0,
    /** ALL text operators: Unicode-NFC-normalize `text` (q92's
      * expression, UAX #15) BEFORE lowercasing/tokenizing, so
      * visually-identical code-point variants ("é" composed vs
      * "e"+U+0301) tokenize, fingerprint (q30/q53), shingle, and
      * BPE-segment identically. 0 = off (the shipped default — raw
      * bytes keep their historical hashes), 1 = on. Mirrored verbatim
      * in every oracle (DuckDB's `nfc_normalize` is the same UAX #15
      * NFC — q92 pins byte agreement), matrix-tested like dfCap
      * because it changes results on denormalized input. */
    normalizeNfc: Int = 0,
    /** q82-q91 + the escape-mode gate twins (q93/q94): lift the BPE
      * charset contract with a DELIMITER ESCAPE in the segmentation
      * encoding. The seg string's `(`/`)` delimiters force today's
      * contract (words containing either are excluded from the
      * vocabulary); with this knob on, token content is escaped
      * per-character (`\` → `\\`, `(` → `\p`, `)` → `\q` — a
      * concatenation-homomorphic injection whose image avoids raw
      * parens) so EVERY word joins the vocabulary: `f(x)`, citations,
      * emoticons, and the exported GPT-2-style interchange files
      * become faithful to full-coverage consumers. Merge-pair
      * tie-breaks order by the ESCAPED byte form on both engines (the
      * seg domain both actually sort in); outputs (merge table, vocab,
      * token ids) unescape back to real text. 0 = off (the shipped
      * default — historical hashes keep the drop-paren contract),
      * 1 = on. Mirrored in every BPE oracle CTE; matrix-tested like
      * dfCap because it changes results on paren-bearing input. */
    bpeEscape: Int = 0,
    /** q82-q91 + the pretok gate twins (q96/q97): GPT-2-style regex
      * PRETOKENIZATION on the BPE surfaces. Whitespace words split
      * further at contraction/punctuation boundaries with the GPT-2
      * pattern (contractions `'s 't 're 've 'm 'll 'd` first, then
      * letter runs, digit runs, and other-symbol runs — leftmost-first
      * alternation, identical in both engines' regex dialects), so
      * `don't` segments as `don` + `'t` and `word.` shares the `word`
      * vocabulary entry instead of bloating merges on punctuation-glued
      * variants — the behavior a GPT-2-style consumer of the exported
      * `merges.txt`/`vocab.json` expects. BPE-only: fingerprints,
      * shingles, BM25, and runs keep the whitespace tokenization.
      * Composes with [[normalizeNfc]] (applied first) and [[bpeEscape]]
      * (the segmentation encoding). 0 = off (the shipped default —
      * historical hashes keep whole-word vocabulary), 1 = on. Mirrored
      * in every BPE oracle CTE; matrix-tested like dfCap because it
      * changes results on punctuation-bearing input. */
    bpePretok: Int = 0,
    /** q32/q38/q72/q81 (defense in depth under [[verifyPairBudget]]):
      * optional band-bucket ceiling BELOW [[minhashBucketCap]] — a band
      * bucket holding more than this many documents is dropped before
      * pairing, cutting a saturated corpus's candidate mass at the root
      * (a bucket of b docs emits b·(b−1)/2 pairs, so halving the cap
      * quarters the worst-case volume) where the verify budget merely
      * survives it in bounded passes. 0 = disabled (the shipped
      * default — dropping buckets CHANGES results, so turning it on is
      * a per-dataset recall/cost decision, matrix-tested like dfCap).
      * When enabled the effective ceiling is min(this,
      * minhashBucketCap), mirrored in the oracle SQL. */
    bandBucketCap: Int = 0,
    /** q104-q106: maximum Hamming distance (over the 64-bit dHash) for
      * two images to count as perceptual near-duplicates. The 4×16-bit
      * band index catches EVERY pair at distance ≤ 3 (pigeonhole: ≤ 3
      * flipped bits leave at least one band untouched); above 3 the
      * verify still applies this threshold but candidate recall is
      * probabilistic (standard LSH semantics — a pair must share one
      * exact band to be considered). */
    dhashMaxHamming: Int = 3,
    /** q105/q106: max images per dHash band bucket before the bucket is
      * dropped as non-discriminative (flat/degenerate rasters mass-
      * collide at hash 0 — the q34 lshBucketCap rule applied to the
      * perceptual index). */
    dhashBandCap: Int = 64,
    /** q107/serveSurprisal(order=2): interpolation weight λ of the
      * bigram term in λ·P(w|prev) + (1−λ)·P₁(w) — the standard
      * Jelinek-Mercer mix; the unigram floor keeps every token's
      * probability positive even when the bigram is unseen. Parsed per
      * mille (an Int knob like the rest): 700 = 0.7, the shipped
      * default. */
    lmLambdaPerMille: Int = 700,
    /** q110/serveSurprisal(order=3): the STUPID-BACKOFF discount α —
      * a token whose trigram is unseen scores α·(bigram ratio), and
      * α²·(Laplace unigram) when the bigram is unseen too (Brants et
      * al. 2007's heuristic: score mass shrinks per backoff level, no
      * normalization). Per mille: 400 = 0.4, the published default.
      */
    lmAlphaPerMille: Int = 400,
    /** q108/q109: target piece-vocabulary size of the SentencePiece-
      * style unigram-LM tokenizer (single characters are always kept
      * on top of the multi-character budget — the SentencePiece
      * required-chars rule, so coverage never breaks). */
    spVocab: Int = 120,
    /** q108/q109: maximum piece length in code points — bounds the
      * seed-substring table (words × len × this) and the Viterbi DP
      * fan-in. */
    spPieceLen: Int = 4,
    /** q108/q109: Viterbi-EM refinement rounds (hard EM — each round
      * re-segments the training vocabulary under the current piece
      * probabilities, recounts, and re-prunes). 0 = serve the seed
      * model. Capped at 4: the oracle unrolls one Viterbi chain per
      * round. */
    spIters: Int = 2,
    /** q86: minimum shared-run length IN TOKENS for a doc pair to be
      * reported as an exact-substring overlap. Runs shorter than the
      * 8-token window can't be observed at all, so this must be ≥ 8;
      * raising it cheapens the report (fewer pairs survive the island
      * aggregation) without changing the candidate volume, which
      * [[dfCap]] bounds. */
    runMinTokens: Int = 16) {

  /** Minhash signature length — bands × rows, every row one affine
    * permutation over the 2³¹−1 prime field. */
  def sigK: Int = minhashBands * minhashRows

  /** [[lmLambdaPerMille]] as the double the scorers interpolate with. */
  def lmLambda: Double = lmLambdaPerMille / 1000.0

  /** [[lmAlphaPerMille]] as the double the backoff scorer multiplies
    * with. */
  def lmAlpha: Double = lmAlphaPerMille / 1000.0

  private[graft] def validate(): Unit = {
    def pos(v: Int, name: String): Unit =
      if (v < 1) throw ConfigurationError(
        s"graft.tuning.$name must be a positive integer, got $v")
    pos(dfCap, "dfCap"); pos(minhashBands, "minhashBands")
    pos(minhashRows, "minhashRows"); pos(minhashBucketCap, "minhashBucketCap")
    pos(lshTables, "lshTables"); pos(lshBucketCap, "lshBucketCap")
    pos(nprobe, "nprobe"); pos(sourceQuota, "sourceQuota"); pos(kmvK, "kmvK")
    pos(annQueries, "annQueries"); pos(pqSubspaces, "pqSubspaces")
    pos(pqSubDim, "pqSubDim"); pos(pqCentroids, "pqCentroids")
    pos(refineFactor, "refineFactor"); pos(storeMaxSegments, "storeMaxSegments")
    pos(bloomBits, "bloomBits"); pos(outlierK, "outlierK")
    pos(verifyPairBudget, "verifyPairBudget"); pos(bpeMerges, "bpeMerges")
    pos(bpeSampleMod, "bpeSampleMod"); pos(bpeMinFreq, "bpeMinFreq")
    if (bpeVocabCap < 0) throw ConfigurationError(
      s"graft.tuning.bpeVocabCap must be >= 0 (0 disables the cap), got $bpeVocabCap")
    if (normalizeNfc != 0 && normalizeNfc != 1) throw ConfigurationError(
      s"graft.tuning.normalizeNfc must be 0 (off) or 1 (on), got $normalizeNfc")
    if (bpeEscape != 0 && bpeEscape != 1) throw ConfigurationError(
      s"graft.tuning.bpeEscape must be 0 (off) or 1 (on), got $bpeEscape")
    if (bpePretok != 0 && bpePretok != 1) throw ConfigurationError(
      s"graft.tuning.bpePretok must be 0 (off) or 1 (on), got $bpePretok")
    if (bandBucketCap < 0) throw ConfigurationError(
      s"graft.tuning.bandBucketCap must be >= 0 (0 disables the cap), got $bandBucketCap")
    if (dhashMaxHamming < 0 || dhashMaxHamming > 64) throw ConfigurationError(
      s"graft.tuning.dhashMaxHamming must be in [0, 64], got $dhashMaxHamming")
    pos(dhashBandCap, "dhashBandCap")
    if (lmLambdaPerMille < 0 || lmLambdaPerMille > 1000) throw ConfigurationError(
      s"graft.tuning.lmLambdaPerMille must be in [0, 1000], got $lmLambdaPerMille")
    // floor 1, not 0: a zero discount assigns probability 0 to every
    // backed-off token — undefined surprisal (ln 0), and the oracle's
    // ln() rejects it outright
    if (lmAlphaPerMille < 1 || lmAlphaPerMille > 1000) throw ConfigurationError(
      s"graft.tuning.lmAlphaPerMille must be in [1, 1000], got $lmAlphaPerMille")
    pos(spVocab, "spVocab")
    if (spPieceLen < 1 || spPieceLen > 8) throw ConfigurationError(
      s"graft.tuning.spPieceLen must be in [1, 8], got $spPieceLen")
    if (spIters < 0 || spIters > 4) throw ConfigurationError(
      s"graft.tuning.spIters must be in [0, 4] (the oracle unrolls one" +
        s" Viterbi chain per round), got $spIters")
    if (runMinTokens < 8) throw ConfigurationError(
      s"graft.tuning.runMinTokens must be >= 8 (the shingle window width" +
        s" — shorter runs are unobservable), got $runMinTokens")
    if (bloomBits > (1 << 26)) throw ConfigurationError(
      s"graft.tuning.bloomBits must be <= ${1 << 26} (Spark's runtime-filter ceiling), got $bloomBits")
    // positive form so NaN (for which every comparison is false) is
    // rejected rather than slipping past a <=||> pair
    if (!(ccEdgeJaccard > 0.0 && ccEdgeJaccard <= 1.0)) throw ConfigurationError(
      s"graft.tuning.ccEdgeJaccard must be in (0, 1], got $ccEdgeJaccard")
    if (lloydIters < 0) throw ConfigurationError(
      s"graft.tuning.lloydIters must be >= 0, got $lloydIters")
    // the affine minhash constants stay inside a signed 64-bit product
    // only while (1222334441 + 98765·(sigK−1)) · (2³¹−1) < 2⁶³
    if (sigK > 64) throw ConfigurationError(
      s"graft.tuning minhashBands*minhashRows must be <= 64, got $sigK")
    if (lshTables > 16) throw ConfigurationError(
      s"graft.tuning.lshTables must be <= 16, got $lshTables")
  }
}

object Tuning {

  /** The PRODUCTION profile — the correct-for-real-corpora knob set as
    * ONE decision instead of five opt-ins (every one defaults off only
    * to keep the historical oracle hashes byte-stable):
    *  - `normalizeNfc = 1`: NFC-normalize before tokenizing — a real
    *    multilingual web corpus carries composed/decomposed variants
    *    of the same visible text;
    *  - `bpeEscape = 1`: the delimiter escape — every word (parens,
    *    code, citations, emoticons) joins the BPE vocabulary, and the
    *    exported GPT-2 interchange files are full-coverage;
    *  - `bpePretok = 1`: GPT-2 regex pretokenization — punctuation
    *    doesn't bloat the vocabulary and the exported files behave as
    *    a GPT-2 consumer expects on contractions;
    *  - `bpeMinFreq = 2`: drop the hapax tail from the TRAINING
    *    vocabulary (most of a web corpus's word types; measured
    *    ~40% of a hapax-heavy vocabulary for +0.0006% encode tokens);
    *  - `bpeVocabCap = 100000`: the HARD driver-memory bound on the
    *    trainer's vocabulary collect, whatever the corpus;
    *  - `bandBucketCap = 3`: drop non-discriminative LSH band buckets
    *    before pairing — the measured defusal of the saturated-corpus
    *    candidate blowup (4.3-4.9× on the synthetic fourth decade).
    * Selected with `-Dgraft.profile=production` (or
    * `GRAFT_PROFILE=production`); individual `graft.tuning.*`
    * overrides still apply ON TOP of the profile's defaults. The
    * tuned-matrix combo P keeps the profile hash-green end-to-end.
    */
  def production: Tuning = Tuning(
    normalizeNfc = 1,
    bpeEscape = 1,
    bpePretok = 1,
    bpeMinFreq = 2,
    bpeVocabCap = 100000,
    bandBucketCap = 3)

  private def raw(name: String): Option[String] = {
    val prop = s"graft.tuning.$name"
    val env = "GRAFT_TUNING_" + name.replaceAll("([A-Z])", "_$1").toUpperCase
    sys.props.get(prop).orElse(sys.env.get(env))
  }

  private def knob(name: String, default: Int): Int =
    raw(name).map { v =>
      try v.trim.toInt
      catch {
        case _: NumberFormatException =>
          throw ConfigurationError(
            s"graft.tuning.$name must be an integer, got '$v'")
      }
    }.getOrElse(default)

  private def knobD(name: String, default: Double): Double =
    raw(name).map { v =>
      try v.trim.toDouble
      catch {
        case _: NumberFormatException =>
          throw ConfigurationError(
            s"graft.tuning.$name must be a number, got '$v'")
      }
    }.getOrElse(default)

  /** The session's knob set — resolved once, used by both the Spark
    * plans and the oracle SQL they are checked against.
    */
  val current: Tuning = {
    // the shipped defaults live ONLY on the case class — the loader
    // derives them from an unconfigured instance so the two can't
    // drift. A profile swaps the BASE the per-knob overrides land on.
    val d = sys.props.get("graft.profile")
      .orElse(sys.env.get("GRAFT_PROFILE")) match {
      case Some("production") => production
      case None | Some("default") => Tuning()
      case Some(other) => throw ConfigurationError(
        s"graft.profile must be 'default' or 'production', got '$other'")
    }
    val t = Tuning(
      dfCap = knob("dfCap", d.dfCap),
      minhashBands = knob("minhashBands", d.minhashBands),
      minhashRows = knob("minhashRows", d.minhashRows),
      minhashBucketCap = knob("minhashBucketCap", d.minhashBucketCap),
      lshTables = knob("lshTables", d.lshTables),
      lshBucketCap = knob("lshBucketCap", d.lshBucketCap),
      nprobe = knob("nprobe", d.nprobe),
      lloydIters = knob("lloydIters", d.lloydIters),
      sourceQuota = knob("sourceQuota", d.sourceQuota),
      kmvK = knob("kmvK", d.kmvK),
      annQueries = knob("annQueries", d.annQueries),
      ccEdgeJaccard = knobD("ccEdgeJaccard", d.ccEdgeJaccard),
      pqSubspaces = knob("pqSubspaces", d.pqSubspaces),
      pqSubDim = knob("pqSubDim", d.pqSubDim),
      pqCentroids = knob("pqCentroids", d.pqCentroids),
      refineFactor = knob("refineFactor", d.refineFactor),
      storeMaxSegments = knob("storeMaxSegments", d.storeMaxSegments),
      bloomBits = knob("bloomBits", d.bloomBits),
      outlierK = knob("outlierK", d.outlierK),
      verifyPairBudget = knob("verifyPairBudget", d.verifyPairBudget),
      bpeMerges = knob("bpeMerges", d.bpeMerges),
      bpeSampleMod = knob("bpeSampleMod", d.bpeSampleMod),
      bpeMinFreq = knob("bpeMinFreq", d.bpeMinFreq),
      bpeVocabCap = knob("bpeVocabCap", d.bpeVocabCap),
      normalizeNfc = knob("normalizeNfc", d.normalizeNfc),
      bpeEscape = knob("bpeEscape", d.bpeEscape),
      bpePretok = knob("bpePretok", d.bpePretok),
      bandBucketCap = knob("bandBucketCap", d.bandBucketCap),
      dhashMaxHamming = knob("dhashMaxHamming", d.dhashMaxHamming),
      dhashBandCap = knob("dhashBandCap", d.dhashBandCap),
      lmLambdaPerMille = knob("lmLambdaPerMille", d.lmLambdaPerMille),
      lmAlphaPerMille = knob("lmAlphaPerMille", d.lmAlphaPerMille),
      spVocab = knob("spVocab", d.spVocab),
      spPieceLen = knob("spPieceLen", d.spPieceLen),
      spIters = knob("spIters", d.spIters),
      runMinTokens = knob("runMinTokens", d.runMinTokens))
    t.validate()
    t
  }
}
