package graft.operators

import graft.{Q, Cols, Tables}
import Cols._
import Tables.{t, spread}
import graft.config.Tuning
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: vocabulary TRAINING (q82) and corpus
  * APPLICATION (q83) as first-class, oracle-checked operators — the
  * piece that turns the text tier's whitespace-proxy token counts
  * (q52/q58) into REAL subword tokens, which is how an LLM data
  * pipeline actually sizes corpora and packs sequences. The reference
  * has no tokenizer (its "schema" is regex capture groups,
  * readport.py:587-620); this is part of the engine's LLM-pipeline
  * extension surface.
  *
  * Algorithm (classic BPE, Sennrich et al. 2016, re-expressed
  * Spark-first):
  *  - the corpus collapses to its VOCABULARY `(word, freq)` — one
  *    corpus-wide shuffle, after which every training round works on
  *    vocabulary-sized data (Heaps' law: ~√corpus), never the corpus;
  *  - each word's segmentation is carried as a delimited string
  *    `(h)(e)(l)(l)(o)`; a merge of pair (l, r) is ONE engine-portable
  *    `replace(seg, '(l)(r)', '(lr)')` — left-to-right non-overlapping,
  *    exactly BPE's merge rule, identical bytes on both engines;
  *  - one round = count adjacent pairs (weighted by word freq) → pick
  *    the max (count desc, pair asc — total order, deterministic) →
  *    apply the merge. The driver loop holds ONE collected row per
  *    round (the q38 fixpoint pattern); rounds cap at
  *    [[graft.config.Tuning.bpeMerges]] and stop early when no pair
  *    repeats (count < 2 — every later round would pick nothing too).
  *
  * The DuckDB oracle replays the SAME rounds as an UNROLLED chain of
  * MATERIALIZED CTEs (one `b{i}` argmax + one `s{i}` re-segmentation
  * per round; materialization keeps the plan linear where inlining
  * would make it exponential in rounds), so q82's merge table and
  * q83's token counts are hash-checked end-to-end against an
  * independent engine.
  *
  * Charset contract: `(` and `)` are the segmentation delimiters, so
  * words containing either are excluded from the vocabulary on BOTH
  * engines (the `WHERE w NOT LIKE ...` twin of the Spark filter) —
  * the same "pick a safe sentinel" trade the reference makes with its
  * `///` missing-value marker (readport.py:358-364). A byte-level
  * escape would lift it; not needed for the corpus surface.
  *
  * Scale shape: training aggregations run on the vocabulary table
  * (map-side-combinable sum per pair), each round's result is
  * localCheckpoint-truncated (the q38 lineage rule), and the apply
  * side (q83) is one vocabulary join against the exploded corpus —
  * AQE broadcasts the vocab map while it fits, shuffles past that.
  * Nothing corpus-sized ever reaches the driver; the one collected
  * row per round is the argmax pair.
  */
final class Bpe(val tuning: Tuning) extends Serializable {
  import Dedup.{toksExpr, toksSqlDuck}

  private val nRounds = tuning.bpeMerges

  /** One trained merge: (rank, left, right, merged, weighted count). */
  private type Merge = (Long, String, String, String, Long)

  /** Trained merges per (corpus dir canonical path + content
    * fingerprint + rounds) — training is deterministic, so a second
    * query (q83 after q82, or a bench's second pass) replays the memo
    * instead of the loop. Driver-side state is bounded: ≤ bpeMerges
    * rows of short strings per corpus.
    */
  @transient private lazy val memo =
    scala.collection.mutable.HashMap[String, Seq[Merge]]()

  /** Memo key = corpus path + file-listing fingerprint + parquet
    * footer ROW COUNT + rounds. The row count closes the listing
    * fingerprint's stale-cache window (a corpus regenerated in place
    * with same-sized files inside the mtime granularity): content that
    * changes the row count re-keys even when the listing doesn't.
    * Remaining contract: a same-rowcount same-size in-place rewrite
    * within one mtime tick replays the memo — acceptable for the
    * fixture workflow, and any on-disk artifact keyed the same way
    * shares it.
    */
  private def memoKey(s: SparkSession, d: String): String =
    new java.io.File(d).getCanonicalPath + ":" +
      ArtifactLake.fingerprint(new java.io.File(s"$d/documents.parquet")) +
      ":" + Tables.footerCount(s, s"$d/documents.parquet").getOrElse(-1L) +
      ":" + nRounds

  /** `(w, freq, seg)` — the vocabulary with each word's initial
    * character segmentation. The corpus collapses here; everything
    * after is vocabulary-sized.
    */
  private def vocab(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    spread(t(s, d, "documents"))
      .select(explode(expr(toksExpr)).as("w"))
      .filter(!$"w".contains("(") && !$"w".contains(")"))
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .withColumn("seg", regexp_replace($"w", "(.)", "($1)"))
  }

  private def segToks(seg: Column): Column =
    regexp_extract_all(seg, lit("""\(([^()]*)\)"""), lit(1))

  /** The training loop — see the module doc for the per-round shape. */
  private def train(s: SparkSession, d: String): Seq[Merge] = synchronized {
    memo.getOrElseUpdate(memoKey(s, d), {
      import s.implicits._
      var seg = vocab(s, d).localCheckpoint(true)
      val out = Vector.newBuilder[Merge]
      var r = 0
      var done = false
      while (r < nRounds && !done) {
        val best = seg
          .select($"freq", segToks($"seg").as("t"))
          .filter(size($"t") >= 2)
          .select($"freq", expr(
            """zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
                 (a, b) -> named_struct('l', a, 'r', b))""").as("ps"))
          .select(explode($"ps").as("p"), $"freq")
          .groupBy($"p.l".as("l"), $"p.r".as("r"))
          .agg(sum($"freq").as("cnt"))
          .filter($"cnt" >= 2)
          .orderBy($"cnt".desc, $"l", $"r")
          .limit(1)
          .collect()
        if (best.isEmpty) done = true
        else {
          val (l, rr, cnt) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          val m = l + rr
          out += ((r + 1L, l, rr, m, cnt))
          val old = seg
          seg = seg.withColumn("seg", call_function("replace",
              $"seg", lit(s"($l)($rr)"), lit(s"($m)")))
            .localCheckpoint(true)
          old.unpersist()
        }
        r += 1
      }
      seg.unpersist()
      out.result()
    })
  }

  /** The vocabulary with its FINAL segmentation — the trained merges
    * replayed as one chained projection (≤ bpeMerges nested compiled
    * replaces), not a re-run of the loop.
    */
  private def finalSeg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val merges = train(s, d)
    val segCol = merges.foldLeft(col("seg")) { case (c, (_, l, r, m, _)) =>
      call_function("replace", c, lit(s"($l)($r)"), lit(s"($m)"))
    }
    vocab(s, d).withColumn("seg", segCol)
  }

  // ------------------------------------------------------------------
  // Oracle SQL: the unrolled MATERIALIZED-CTE replay of the rounds.
  // ------------------------------------------------------------------

  private def trainCtes: String = {
    val head = Seq(
      s"""w AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest($toksSqlDuck) AS w FROM documents)
          WHERE w NOT LIKE '%(%' AND w NOT LIKE '%)%' GROUP BY w)""",
      """s0 AS MATERIALIZED (SELECT w, freq,
           regexp_replace(w, '(.)', '(\1)', 'g') AS seg FROM w)""")
    val rounds = (1 to nRounds).flatMap { i =>
      val p = i - 1
      Seq(
        s"""b$i AS MATERIALIZED (SELECT l, r, l || r AS m,
              CAST(sum(freq) AS BIGINT) AS cnt FROM (
                SELECT freq,
                       unnest(list_transform(range(1, len(tk)), j -> tk[j])) AS l,
                       unnest(list_transform(range(1, len(tk)), j -> tk[j+1])) AS r
                FROM (SELECT freq,
                        regexp_extract_all(seg, '\\(([^()]*)\\)', 1) AS tk
                      FROM s$p))
              GROUP BY l, r HAVING sum(freq) >= 2
              ORDER BY cnt DESC, l, r LIMIT 1)""",
        s"""s$i AS MATERIALIZED (SELECT w, freq,
              CASE WHEN b.l IS NULL THEN seg
                   ELSE replace(seg, '(' || b.l || ')(' || b.r || ')',
                                '(' || b.m || ')') END AS seg
              FROM s$p LEFT JOIN b$i b ON TRUE)""")
    }
    (head ++ rounds).mkString(",\n      ")
  }

  /** q82: the trained merge table — rank-ordered (left, right, merged,
    * weighted pair count). The gate hash-checks every round's argmax
    * against the oracle's independent replay: one disagreement in any
    * round cascades into different merges for every later round, so a
    * green q82 pins the whole training trajectory.
    */
  private val q82 = Q(
    "q82_bpe_train",
    (s, d) => {
      import s.implicits._
      train(s, d)
        .toDF("rank", "l", "r", "merged", "pair_count")
        .orderBy($"rank")
    },
    Some {
      val union = (1 to nRounds).map { i =>
        s"SELECT CAST($i AS BIGINT) AS rank, l, r, m AS merged, cnt AS pair_count FROM b$i"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH $trainCtes
      SELECT * FROM (
        $union) ORDER BY rank"""
    })

  /** q83: apply the trained vocabulary — per-document REAL token
    * counts (words, BPE tokens, tokens-per-word). Train and apply run
    * over the same corpus, so the final segmentation table IS the
    * tokenization map; application is one vocab join against the
    * exploded corpus. Documents tokenize-to-nothing (empty text) are
    * absent on both engines.
    */
  private val q83 = Q(
    "q83_bpe_tokenize",
    (s, d) => {
      import s.implicits._
      val wt = finalSeg(s, d)
        .select($"w", size(segToks($"seg")).cast("long").as("nt"))
      t(s, d, "documents")
        .select($"doc_id", explode(expr(toksExpr)).as("w"))
        .join(wt, "w")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_words"), sum($"nt").as("n_tokens"))
        .select($"doc_id", $"n_words", $"n_tokens",
          r4($"n_tokens" / $"n_words").as("tokens_per_word"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH $trainCtes,
      wt AS (SELECT w, CAST(len(regexp_extract_all(seg, '\\(([^()]*)\\)', 1)) AS BIGINT) AS nt
             FROM s$nRounds),
      dw AS (SELECT doc_id, unnest($toksSqlDuck) AS w FROM documents)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             round(CAST(sum(nt) AS DOUBLE) / count(*), 4) AS tokens_per_word
      FROM dw JOIN wt USING (w)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** q84: sequence packing into 512-token context windows by REAL BPE
    * token counts — q58's range-partitioned two-pass prefix sum (no
    * single-reducer window), re-based from the whitespace proxy onto
    * the trained tokenizer: a document's length is what the model
    * actually consumes, so this is the packing a training run ships.
    * Per-doc counts come from the q83 vocabulary join (left, so docs
    * with no in-vocabulary words pack as zero-length — they consume
    * no context budget, exactly as q58 treats empty text).
    */
  private val q84 = Q(
    "q84_bpe_packing",
    (s, d) => {
      import s.implicits._
      val ctx = 512L
      val wt = finalSeg(s, d)
        .select($"w", size(segToks($"seg")).cast("long").as("nt"))
      val perDoc = t(s, d, "documents")
        .select($"doc_id", explode_outer(expr(toksExpr)).as("w"))
        .join(wt, Seq("w"), "left")
        .groupBy($"doc_id")
        .agg(coalesce(sum($"nt"), lit(0L)).as("n"))
      val ranged = TwoPass.rangedPinned(perDoc.as[(Long, Long)], $"doc_id")
      // pass 1: per-partition token totals — P scalars to the driver
      val sums = TwoPass.withPid(ranged) { (pid, it) =>
        var tot = 0L
        it.foreach { case (_, n) => tot += n }
        Iterator.single((pid, tot))
      }.collect()
      val offsets: Map[Int, Long] = {
        var running = 0L
        sums.sortBy(_._1).map { case (pid, tot) =>
          val off = running; running += tot; pid -> off
        }.toMap
      }
      val bOff = s.sparkContext.broadcast(offsets)
      // pass 2: a doc's start offset = partition offset + tokens
      // before it locally; its bin is start / ctx
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
      WITH $trainCtes,
      wt AS (SELECT w, CAST(len(regexp_extract_all(seg, '\\(([^()]*)\\)', 1)) AS BIGINT) AS nt
             FROM s$nRounds),
      dw AS (SELECT doc_id, unnest($toksSqlDuck) AS w FROM documents),
      dn AS (SELECT dw.doc_id, CAST(coalesce(sum(wt.nt), 0) AS BIGINT) AS n
             FROM dw LEFT JOIN wt USING (w) GROUP BY dw.doc_id),
      c AS (SELECT d.doc_id, CAST(coalesce(dn.n, 0) AS BIGINT) AS n
            FROM documents d LEFT JOIN dn USING (doc_id)),
      pw AS (SELECT doc_id, n,
              coalesce(sum(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
            FROM c),
      b AS (SELECT doc_id, n, CAST(strt // 512 AS BIGINT) AS bin FROM pw)
      SELECT bin, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM b
      GROUP BY bin
      ORDER BY bin"""))

  val all: Seq[Q] = Seq(q82, q83, q84)
}
