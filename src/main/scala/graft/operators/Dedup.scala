package graft.operators

import graft.{Q, Cols, Tables}
import Cols._
import Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, over the
  * `documents` and `embeddings` tables: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * All hashing is [[Cols.md5Long]] (md5-derived) so the DuckDB oracle
  * replays signatures bit-for-bit.
  *
  * Scale notes: every variant here is the shuffle-bounded formulation —
  * inverted-index joins on shingles/buckets rather than O(n²) document
  * cross-products. At 100 TB the LSH band join (q32) is the production
  * path: candidate volume is controlled by band count, and the exact
  * verify only runs on candidates.
  */
object Dedup {

  /** Tokenization shared by all text operators (Spark-side SQL fragment).
    * DuckDB twin: list_filter(string_split_regex(lower(text),'\s+'), ...).
    */
  val toksExpr = """filter(split(lower(text), '\\s+'), x -> x != '')"""
  val toksSqlDuck = """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""

  /** Distinct 3-word shingles from a `toks` array column. */
  val shinglesExpr =
    """CASE WHEN size(toks) >= 3
       THEN array_distinct(transform(sequence(1, size(toks)-2),
            i -> concat_ws(' ', slice(toks, i, 3))))
       ELSE cast(array() as array<string>) END"""
  val shinglesSqlDuck =
    """list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
         i -> array_to_string(list_slice(toks, i, i+2), ' ')))"""

  /** Exact dedup: hash-groupBy on the normalized text. One shuffle on the
    * 128-bit fingerprint; at 100 TB this is the classic first pass
    * (map-side partial count keeps the shuffle at one row per distinct).
    */
  private val q30 = Q(
    "q30_dedup_exact",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .groupBy(md5(lower(trim($"text"))).as("fp"))
        .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .select($"keeper", $"fp", $"n_copies")
        .orderBy($"keeper")
    },
    Some("""
      SELECT min(doc_id) AS keeper, md5(lower(trim(text))) AS fp, count(*) AS n_copies
      FROM documents
      GROUP BY 2
      ORDER BY keeper"""))

  /** N-gram Jaccard similarity via inverted-index self-join on shingles
    * (not a cross product): top-20 most similar document pairs. Ranking
    * uses the rounded score + id tie-break for engine determinism.
    */
  private val q31 = Q(
    "q31_dedup_ngram_jaccard",
    (s, d) => {
      import s.implicits._
      val sh = t(s, d, "documents")
        .select($"doc_id", expr(toksExpr).as("toks"))
        .select($"doc_id", expr(shinglesExpr).as("sh"))
      val ex = sh.select($"doc_id", explode($"sh").as("s"))
      val sizes = sh.select($"doc_id", size($"sh").as("nsh"))
      val pairs = ex.as("a")
        .join(ex.as("b"), $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"))
        .agg(count(lit(1)).as("common"))
      pairs
        .join(sizes.withColumnRenamed("doc_id", "a_id")
          .withColumnRenamed("nsh", "na"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id")
          .withColumnRenamed("nsh", "nb"), "b_id")
        .withColumn("jacc", $"common" / ($"na" + $"nb" - $"common"))
        .orderBy(round($"jacc", 6).desc, $"a_id", $"b_id")
        .limit(20)
        .select($"a_id", $"b_id", r4($"jacc").as("jaccard"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, $toksSqlDuck AS toks FROM documents),
      sh AS (SELECT doc_id, $shinglesSqlDuck AS sh FROM toks),
      ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      sizes AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
      SELECT a_id, b_id,
             round(common / (na.nsh + nb.nsh - common), 4) AS jaccard
      FROM p JOIN sizes na ON a_id = na.doc_id JOIN sizes nb ON b_id = nb.doc_id
      ORDER BY round(common / (na.nsh + nb.nsh - common), 6) DESC, a_id, b_id
      LIMIT 20"""))

  /** MinHash (k=16) + LSH (8 bands × 2 rows) + exact-Jaccard verify on
    * the candidates only. The band join is the scale path: shuffle
    * volume is docs×bands, candidate pairs are bucket-local.
    */
  private val q32 = Q(
    "q32_dedup_minhash_lsh",
    (s, d) => {
      import s.implicits._
      val sh = t(s, d, "documents")
        .select($"doc_id", expr(toksExpr).as("toks"))
        .select($"doc_id", expr(shinglesExpr).as("sh"))
        .filter(size($"sh") > 0)
      val sig = sh.withColumn("sig", expr(
        """transform(sequence(0, 15), i -> array_min(transform(sh,
           t -> cast(conv(substring(md5(concat(cast(i as string), '|', t)), 1, 15), 16, 10) as bigint))))"""))
      val bands = sig.select($"doc_id", $"sh",
          explode(expr("sequence(0, 7)")).as("b"), $"sig")
        .withColumn("band_key",
          expr("md5(concat_ws(',', slice(sig, b*2+1, 2)))"))
        .select($"doc_id", $"sh", $"b", $"band_key")
      val cand = bands.as("x")
        .join(bands.as("y"),
          $"x.b" === $"y.b" && $"x.band_key" === $"y.band_key" &&
            $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"),
          $"x.sh".as("sha"), $"y.sh".as("shb"))
        .distinct()
      cand
        .withColumn("common", size(array_intersect($"sha", $"shb")))
        .withColumn("jacc",
          $"common" / (size($"sha") + size($"shb") - $"common"))
        .select($"a_id", $"b_id", r4($"jacc").as("jaccard"))
        .orderBy($"a_id", $"b_id")
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, $toksSqlDuck AS toks FROM documents),
      sh0 AS (SELECT doc_id, $shinglesSqlDuck AS sh FROM toks),
      sh AS (SELECT * FROM sh0 WHERE len(sh) > 0),
      sig AS (SELECT doc_id, sh,
                list_transform(range(0, 16), i -> list_min(list_transform(sh,
                  t -> CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || t), 1, 15) AS BIGINT)))) AS sig
              FROM sh),
      bands AS (SELECT doc_id, sh, b,
                  md5(array_to_string(list_slice(sig, b*2+1, b*2+2), ',')) AS band_key
                FROM sig, (SELECT unnest(range(0, 8)) AS b) bs),
      cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
                      x.sh AS sha, y.sh AS shb
               FROM bands x JOIN bands y
                 ON x.b = y.b AND x.band_key = y.band_key AND x.doc_id < y.doc_id)
      SELECT a_id, b_id,
             round(len(list_intersect(sha, shb)) /
                   (len(sha) + len(shb) - len(list_intersect(sha, shb))), 4) AS jaccard
      FROM cand
      ORDER BY a_id, b_id"""))

  /** SimHash (32-bit): per-token md5-derived 40-bit hash, weighted bit
    * majority vote, integer-only arithmetic so both engines agree
    * exactly. Documents whose signatures collide are near-dup candidates.
    */
  private val q33 = Q(
    "q33_dedup_simhash",
    (s, d) => {
      import s.implicits._
      val tok = t(s, d, "documents")
        .select($"doc_id", explode(expr(toksExpr)).as("tk"))
        .select($"doc_id",
          expr("cast(conv(substring(md5(tk), 1, 10), 16, 10) as bigint)").as("h"))
      val bits = tok
        .select($"doc_id", $"h", explode(expr("sequence(0, 31)")).as("j"))
        .groupBy($"doc_id", $"j")
        .agg(sum(expr(
          "2 * (cast(floor(h / pow(2, j)) as bigint) % 2) - 1")).as("sgn"))
      bits.groupBy($"doc_id")
        .agg(sum(expr(
          "CASE WHEN sgn > 0 THEN cast(pow(2, j) as bigint) ELSE 0 END"))
          .as("simhash"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, $toksSqlDuck AS toks FROM documents),
      ex AS (SELECT doc_id, unnest(toks) AS tk FROM toks),
      h AS (SELECT doc_id, CAST('0x' || substr(md5(tk), 1, 10) AS BIGINT) AS h FROM ex),
      bits AS (SELECT doc_id, j,
                 sum(2 * (CAST(floor(h / pow(2, j)) AS BIGINT) % 2) - 1) AS sgn
               FROM h, (SELECT unnest(range(0, 32)) AS j) js
               GROUP BY doc_id, j)
      SELECT doc_id,
             CAST(sum(CASE WHEN sgn > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      FROM bits
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** Embedding-cosine near-dup with label blocking: pairs are only formed
    * inside a block (the 100 TB pattern — block/bucket first, pair
    * second), cosine computed on double-cast vectors, threshold on the
    * rounded score so the engines agree at the boundary.
    */
  private val q34 = Q(
    "q34_dedup_embedding_cosine",
    (s, d) => {
      import s.implicits._
      val e = t(s, d, "embeddings")
        .select($"vec_id", $"label",
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm",
          expr("sqrt(aggregate(v, cast(0.0 as double), (a, x) -> a + x*x))"))
      val a = e.select($"vec_id".as("a_id"), $"label",
        $"v".as("av"), $"nrm".as("anrm"))
      val b = e.select($"vec_id".as("b_id"), $"label".as("lb"),
        $"v".as("bv"), $"nrm".as("bnrm"))
      a.join(b, $"label" === $"lb" && $"a_id" < $"b_id")
        .withColumn("dot", expr(
          "aggregate(zip_with(av, bv, (x, y) -> x*y), cast(0.0 as double), (acc, x) -> acc + x)"))
        .withColumn("cosine", $"dot" / ($"anrm" * $"bnrm"))
        .filter(round($"cosine", 6) >= 0.35)
        .select($"a_id", $"b_id", r4($"cosine").as("cosine"))
        .orderBy($"a_id", $"b_id")
    },
    Some("""
      WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
      n AS (SELECT vec_id,
              sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
            FROM e),
      u AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
              unnest(embedding)::DOUBLE AS v FROM e),
      d AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, sum(a.v * b.v) AS dot
            FROM u a JOIN u b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
            GROUP BY 1, 2)
      SELECT a_id, b_id, round(dot / (na.nrm * nb.nrm), 4) AS cosine
      FROM d JOIN n na ON a_id = na.vec_id JOIN n nb ON b_id = nb.vec_id
      WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.35
      ORDER BY a_id, b_id"""))

  val all: Seq[Q] = Seq(q30, q31, q32, q33, q34)
}
