package graft.operators

import graft.{Q, Cols, Tables}
import Cols._
import Tables.{t, spread}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64-dim).
  *
  * The tiers:
  *  - q40: brute-force cosine top-k — the correctness baseline.
  *  - q41: adaptive sign-bit LSH buckets (axis hyperplanes for
  *    determinism, bit count grows with the corpus) — the constant-
  *    bucket-size scale path: pairing happens only inside buckets.
  *  - q42: per-label centroids — the coarse-quantizer building block.
  *  - q43/q44: IVF with ⌈√n⌉ deterministic seed cells, single-probe
  *    and nprobe=2 multi-probe search.
  *
  * Dot products run through the codegen'd posexplode → equi-join →
  * hash-agg pipeline, NOT array higher-order functions: HOF lambdas are
  * interpreted row-at-a-time and measured ~10× slower than the
  * codegen'd join at the same arithmetic. The exploded dimension table
  * is cached — it is read by both join sides and the norm aggregate,
  * and is tiny relative to the pair volume it feeds.
  */
object Similarity {

  /** (vec_id, bucket, dim, v): one row per vector component, double-cast,
    * with a `bits`-bit sign bucket attached (sign of the first `bits`
    * dimensions — axis hyperplanes, so both engines agree bit-for-bit).
    * Cached (multi-consumer). The bucket expression is built as a static
    * codegen'd sum, not a HOF (interpreted lambdas measured ~10× slower).
    */
  private[operators] def unpacked(s: SparkSession, d: String, bits: Int = 4): DataFrame = {
    import s.implicits._
    val bucketExpr = (0 until bits)
      .map(j => s"(CASE WHEN embedding[$j] > 0 THEN ${1L << j}L ELSE 0L END)")
      .mkString(" + ")
    spread(t(s, d, "embeddings"))
      .select($"vec_id", $"label",
        expr(s"CAST($bucketExpr AS BIGINT)").as("bucket"),
        posexplode(expr("transform(embedding, x -> cast(x as double))")))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "v")
      .cache()
  }

  private[operators] def norms(u: DataFrame): DataFrame =
    u.groupBy("vec_id").agg(sqrt(sum(expr("v * v"))).as("nrm"))

  /** Adaptive hyperplane count: bucket count ≈ n/64 so expected bucket
    * size stays constant as the corpus grows. ε-guarded so Spark and the
    * DuckDB oracle (greatest(4, ceil(log2(n/64.0) - 1e-9))) agree even
    * if their log2 differs by an ulp. Shared by q41 and Dedup's q34.
    */
  private[operators] def signBits(n: Long): Int =
    math.min(64, math.max(4,
      math.ceil(math.log(n / 64.0) / math.log(2.0) - 1e-9).toInt))

  /** An IVF codebook: (cell id, centroid vector). ⌈√n⌉ entries ⇒ 16 MB
    * at n = 10⁹ — always broadcastable.
    */
  private[operators] type Codebook = Array[(Long, Array[Double])]

  /** The deterministic initial codebook: the ⌈√n⌉ vectors with
    * `vec_id % stride = 0`, collected once. Column-predicate filter
    * BEFORE the typed view so seed selection stays codegen'd (a lambda
    * filter would deserialize all n rows to pick the √n seeds); NULL
    * embeddings are skipped like the oracle's unnest(NULL).
    */
  private def seedCodebook(s: SparkSession, d: String, stride: Long): Codebook = {
    import s.implicits._
    t(s, d, "embeddings")
      .filter($"vec_id" % stride === 0 && $"embedding".isNotNull)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect()
      .map { case (sid, v) => (sid, v.map(_.toDouble)) }
      .sortBy(_._1)
  }

  /** IVF coarse assignment as broadcast-codebook + compiled map — the
    * production IVF shape: the codebook is broadcast and each vector's
    * nProbe nearest cells are computed in a tight per-row loop — a
    * narrow map stage with NO shuffle at all (the earlier declarative
    * form materialized n×64×k posexplode-join rows and shuffled n×k
    * partial dot products).
    *
    * Determinism mirrors the oracle exactly: score = ‖c‖²−2⟨v,c⟩ in
    * dimension order, rounded with the same floor(x·10⁶+0.5)/10⁶ as
    * [[graft.Cols.r6]], cell-id tiebreak. Emits (vec_id, cell, rk) for
    * rk = 1..nProbe.
    */
  private[operators] def assignCells(s: SparkSession, d: String,
      cb: Codebook, nProbe: Int): DataFrame = {
    import s.implicits._
    val emb = t(s, d, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
    val bc = s.sparkContext.broadcast(cb)
    emb.mapPartitions { it =>
      val cells = bc.value
      it.flatMap { case (id, vf) =>
        // NULL embedding ⇒ unassigned, matching the oracle (no rows)
        if (vf == null) Iterator.empty
        else {
          val v = vf.map(_.toDouble)
          val scored = cells.map { case (cid, cv) =>
            var dot = 0.0
            var cn2 = 0.0
            var i = 0
            // ‖c‖² over ALL centroid dims (the oracle's sum(cv*cv));
            // the dot only over dims the vector has
            while (i < cv.length) {
              cn2 += cv(i) * cv(i)
              if (i < v.length) dot += v(i) * cv(i)
              i += 1
            }
            (math.floor((cn2 - 2.0 * dot) * 1e6 + 0.5) / 1e6, cid)
          }
          scored.sortBy(x => (x._1, x._2)).take(nProbe)
            .iterator.zipWithIndex
            .map { case ((_, cid), idx) => (id, cid, idx + 1) }
        }
      }
    }.toDF("vec_id", "cell", "rk")
  }

  /** Lloyd-refined IVF codebook: `iters` deterministic k-means
    * iterations over the seed codebook — assign every vector to its
    * nearest cell (broadcast-codebook map, no shuffle), then recompute
    * centroids as the dimension-wise r6-rounded mean (one n×dims →
    * k×dims hash agg; k×dims rows collected, √n·64 doubles). Refined
    * centroids sit at their cells' mass centers, so Voronoi cells are
    * tighter and nearest-neighbor recall improves (measured by q45)
    * at UNCHANGED asymptotics: 2 extra map passes + 2 small aggs,
    * still no pairing outside cells.
    *
    * Both engines replay the identical refinement (assignment CTE →
    * centroid agg, twice, in the oracle SQL): centroids are rounded to
    * 6 dp on both sides, assignment scores are rounded + cell-id
    * tiebroken, so the quantizer stays bit-deterministic. Cells that
    * lose all members simply drop out on both sides. Cell ids remain
    * the original seed vec_ids.
    */
  private[operators] def refinedCodebook(s: SparkSession, d: String,
      stride: Long, u: DataFrame, iters: Int = 2): Codebook = {
    import s.implicits._
    var cb = seedCodebook(s, d, stride)
    for (_ <- 1 to iters) {
      val assign = assignCells(s, d, cb, nProbe = 1).select($"vec_id", $"cell")
      val cents = u.select($"vec_id", $"i", $"v")
        .join(assign, "vec_id")
        .groupBy($"cell", $"i")
        .agg(r6(avg($"v")).as("cv"))
        .as[(Long, Int, Double)]
        .collect()
      cb = cents.groupBy(_._1).toArray.sortBy(_._1).map { case (cell, rows) =>
        // sparse dims (possible with ragged embeddings) fill with 0.0 —
        // contributes nothing to ‖c‖² or the dot, same as the oracle's
        // absent (cell, dim) row
        val arr = new Array[Double](rows.map(_._2).max + 1)
        rows.foreach { case (_, i, cv) => arr(i) = cv }
        (cell, arr)
      }
    }
    cb
  }

  /** Brute-force cosine top-5 for a fixed query set (vec_id < 10). */
  private def bruteforceDF(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val u = unpacked(s, d)
      val n = norms(u)
      val qs = u.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"i".as("qi"), $"v".as("qv"))
      val dots = qs.join(u.select($"vec_id".as("n_id"), $"i", $"v"),
          $"qi" === $"i" && $"q_id" =!= $"n_id")
        .groupBy($"q_id", $"n_id")
        .agg(sum($"qv" * $"v").as("dot"))
      val scored = dots
        .join(broadcast(n.select($"vec_id".as("q_id"), $"nrm".as("qn"))), "q_id")
        .join(broadcast(n.select($"vec_id".as("n_id"), $"nrm".as("cn"))), "n_id")
        .withColumn("cosine", $"dot" / ($"qn" * $"cn"))
      val w = Window.partitionBy($"q_id")
        .orderBy(r6($"cosine").desc, $"n_id")
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 5)
        .select($"q_id", $"rk", $"n_id", r4($"cosine").as("cosine"))
        .orderBy($"q_id", $"rk")
  }

  private val q40 = Q(
    "q40_ann_bruteforce",
    bruteforceDF,
    Some("""
      WITH e AS (SELECT vec_id, embedding FROM embeddings),
      n AS (SELECT vec_id,
              sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
            FROM e),
      u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
              unnest(embedding)::DOUBLE AS v FROM e),
      d AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id, sum(q.v * c.v) AS dot
            FROM (SELECT * FROM u WHERE vec_id < 10) q
            JOIN u c ON q.i = c.i AND q.vec_id <> c.vec_id
            GROUP BY 1, 2),
      scored AS (SELECT q_id, n_id, dot / (nq.nrm * nc.nrm) AS cosine
                 FROM d JOIN n nq ON q_id = nq.vec_id JOIN n nc ON n_id = nc.vec_id),
      ranked AS (SELECT q_id, n_id, cosine,
                   row_number() OVER (PARTITION BY q_id
                     ORDER BY round(cosine, 6) DESC, n_id) AS rk
                 FROM scored)
      SELECT q_id, rk, n_id, round(cosine, 4) AS cosine
      FROM ranked WHERE rk <= 5
      ORDER BY q_id, rk"""))

  /** Sign-bit LSH: bucket on the sign pattern of the first `bits` dims,
    * nearest neighbor inside the bucket only.
    *
    * Scale-true bucketing (round-2 fix — the round-1 form used 4 fixed
    * bits = 16 buckets, an O(n²/16) constant-factor cut, not a scale
    * path):
    *  - `bits` GROWS with the corpus: bits = ⌈log2(n/64)⌉, so bucket
    *    count ≈ n/64 and expected bucket size stays ~64 regardless of n.
    *    Within-bucket all-pairs is then O(n·64) TOTAL — linear in n —
    *    instead of O(n²/2^bits). Both engines derive `bits` from the
    *    same count with the same ε-guarded formula, so buckets agree
    *    bit-for-bit (axis hyperplanes, integer bucket ids).
    *  - skew guard: a bucket holding >512 vectors (8× expected — only a
    *    pathological sign-degenerate region, e.g. all-zero embeddings)
    *    is non-discriminative and is dropped whole, the same rule as the
    *    q32 LSH bucket cap; the oracle applies the identical cap. The
    *    overfull set is tiny, so it anti-joins as a broadcast — no extra
    *    shuffle on the big side.
    */
  private def lshDF(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val n0 = Tables.rowCount(s, d, "embeddings")  // footer metadata, no scan
      val bits = signBits(n0)
      val u0 = unpacked(s, d, bits)
      val over = u0.filter($"i" === 0)
        .groupBy($"bucket").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" > 512).select($"bucket")
      val u = u0.join(broadcast(over), Seq("bucket"), "left_anti")
      val n = norms(u)
      val a = u.select($"vec_id".as("a_id"), $"bucket", $"i".as("ai"), $"v".as("av"))
      val b = u.select($"vec_id".as("b_id"), $"bucket".as("bk"), $"i".as("bi"), $"v".as("bv"))
      val dots = a.join(b,
          $"ai" === $"bi" && $"bucket" === $"bk" && $"a_id" =!= $"b_id")
        .groupBy($"a_id", $"bucket", $"b_id")
        .agg(sum($"av" * $"bv").as("dot"))
      val scored = dots
        .join(broadcast(n.select($"vec_id".as("a_id"), $"nrm".as("an"))), "a_id")
        .join(broadcast(n.select($"vec_id".as("b_id"), $"nrm".as("bn"))), "b_id")
        .withColumn("cosine", $"dot" / ($"an" * $"bn"))
      val w = Window.partitionBy($"a_id")
        .orderBy(r6($"cosine").desc, $"b_id")
      scored.withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"a_id", $"bucket", $"b_id".as("nn_id"), r4($"cosine").as("cosine"))
        .orderBy($"a_id")
  }

  private val q41 = Q(
    "q41_ann_lsh_bucket",
    lshDF,
    Some("""
      WITH params AS (SELECT least(64, greatest(4,
                        CAST(ceil(log2(count(*) / 64.0) - 1e-9) AS INT))) AS bits
                      FROM embeddings),
      e0 AS (SELECT vec_id, embedding,
               CAST(list_sum(list_transform(range(0, (SELECT bits FROM params)),
                 j -> CASE WHEN embedding[j + 1] > 0 THEN 1::BIGINT << j ELSE 0 END)) AS BIGINT) AS bucket
             FROM embeddings),
      e AS (SELECT * FROM e0 WHERE bucket NOT IN
              (SELECT bucket FROM e0 GROUP BY bucket HAVING count(*) > 512)),
      n AS (SELECT vec_id,
              sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
            FROM e),
      u AS (SELECT vec_id, bucket, generate_subscripts(embedding, 1) AS i,
              unnest(embedding)::DOUBLE AS v FROM e),
      d AS (SELECT a.vec_id AS a_id, a.bucket, b.vec_id AS b_id, sum(a.v * b.v) AS dot
            FROM u a JOIN u b ON a.i = b.i AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
            GROUP BY 1, 2, 3),
      scored AS (SELECT a_id, bucket, b_id, dot / (na.nrm * nb.nrm) AS cosine
                 FROM d JOIN n na ON a_id = na.vec_id JOIN n nb ON b_id = nb.vec_id),
      ranked AS (SELECT a_id, CAST(bucket AS BIGINT) AS bucket, b_id AS nn_id, cosine,
                   row_number() OVER (PARTITION BY a_id
                     ORDER BY round(cosine, 6) DESC, b_id) AS rk
                 FROM scored)
      SELECT a_id, bucket, nn_id, round(cosine, 4) AS cosine
      FROM ranked WHERE rk = 1
      ORDER BY a_id"""))

  /** Per-label centroids: dimension-wise mean — the reduce side of an
    * IVF/k-means coarse quantizer.
    */
  private val q42 = Q(
    "q42_label_centroids",
    (s, d) => {
      import s.implicits._
      t(s, d, "embeddings")
        .select($"label", posexplode(expr("transform(embedding, x -> cast(x as double))")))
        .withColumn("dim", ($"pos" + 1).cast("long"))
        .groupBy($"label", $"dim")
        .agg(r6(avg($"col")).as("centroid"), count(lit(1)).as("n"))
        .orderBy($"label", $"dim")
    },
    Some("""
      WITH u AS (SELECT label, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
                   unnest(embedding)::DOUBLE AS v
                 FROM embeddings)
      SELECT label, dim, round(avg(v), 6) AS centroid, count(*) AS n
      FROM u
      GROUP BY 1, 2
      ORDER BY label, dim"""))

  /** IVF-style ANN: coarse-quantize every vector to its NEAREST cell
    * seed, then search only inside the assigned cell. Assignment
    * minimizes ‖c‖²−2·⟨v,c⟩ (≡ squared distance, per-vector constant
    * dropped), rounded + seed-id-tiebroken for engine determinism.
    *
    * Scale-true cell count (round-2 fix — round 1 used the 10 labels as
    * cells, a CONSTANT, leaving within-cell work quadratic in n): the
    * codebook starts from k = ⌈√n⌉ seed vectors picked
    * deterministically by `vec_id % ⌊n/k⌋ = 0` (both engines derive k
    * and the stride from the same count with the same ε-guarded sqrt)
    * and is then Lloyd-refined for 2 deterministic k-means iterations
    * ([[refinedCodebook]], round 3 — tighter cells, higher recall,
    * same asymptotics; the oracle replays the identical refinement).
    * Expected cell size is √n, the classic IVF balance point:
    * assignment is n·k broadcast-codebook dot products and within-cell
    * pairing totals k·(√n)² = n^1.5 — both sub-quadratic, both
    * shrinking per-cell as n grows.
    */
  /** The shared IVF setup — corpus count, ⌈√n⌉-derived stride, unpacked
    * dims, norms, Lloyd-refined codebook — computed once and reused by
    * q43, q44 and q45 (which runs both searches and would otherwise pay
    * for two identical refinements).
    */
  private case class IvfCtx(u: DataFrame, n: DataFrame, cb: Codebook)

  private def ivfCtx(s: SparkSession, d: String): IvfCtx = {
    import s.implicits._
    val n0 = Tables.rowCount(s, d, "embeddings")  // footer metadata, no scan
    val k = math.ceil(math.sqrt(n0.toDouble) - 1e-9).toLong
    val stride = math.max(1L, n0 / k)
    val u = unpacked(s, d)
    IvfCtx(u, norms(u), refinedCodebook(s, d, stride, u))
  }

  private def ivfDF(s: SparkSession, d: String): DataFrame =
    ivfSearch(s, d, ivfCtx(s, d))

  private def ivfSearch(s: SparkSession, d: String, ctx: IvfCtx): DataFrame = {
      import s.implicits._
      val IvfCtx(u, n, cb) = ctx
      val assign = assignCells(s, d, cb, nProbe = 1)
        .select($"vec_id", $"cell")
      val ua = u.join(assign, "vec_id")
      val a = ua.select($"vec_id".as("a_id"), $"cell", $"i".as("ai"), $"v".as("av"))
      val b = ua.select($"vec_id".as("b_id"), $"cell".as("bc"), $"i".as("bi"), $"v".as("bv"))
      val dots = a.join(b, $"ai" === $"bi" && $"cell" === $"bc" && $"a_id" =!= $"b_id")
        .groupBy($"a_id", $"cell", $"b_id")
        .agg(sum($"av" * $"bv").as("dot"))
      val scored = dots
        .join(broadcast(n.select($"vec_id".as("a_id"), $"nrm".as("an"))), "a_id")
        .join(broadcast(n.select($"vec_id".as("b_id"), $"nrm".as("bn"))), "b_id")
        .withColumn("cosine", $"dot" / ($"an" * $"bn"))
      scored.withColumn("rk", row_number().over(
          Window.partitionBy($"a_id").orderBy(r6($"cosine").desc, $"b_id")))
        .filter($"rk" === 1)
        .select($"a_id", $"cell".cast("long").as("cell"),
          $"b_id".as("nn_id"), r4($"cosine").as("cosine"))
        .orderBy($"a_id")
  }

  /** The oracle's replay of [[refinedCodebook]] + the final assignment:
    * cb0 = stride seeds → assign a0 → cb1 = r6 centroids → assign a1 →
    * cb2 → final assignment CTE named `fa` (rk over rounded score,
    * cell-id tiebreak). Shared verbatim by q43 (rk = 1), q44
    * (rk <= 2 probes / rk = 1 home), and q45 via composition.
    */
  private val ivfOracleCtes = """
      params AS (SELECT greatest(1, count(*) //
                   CAST(ceil(sqrt(count(*)) - 1e-9) AS BIGINT)) AS stride
                 FROM embeddings),
      u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
              unnest(embedding)::DOUBLE AS v FROM embeddings),
      n AS (SELECT vec_id,
              sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
            FROM embeddings),
      cb0 AS (SELECT vec_id AS cell, i AS dim, v AS cv FROM u
              WHERE vec_id % (SELECT stride FROM params) = 0),
      n0 AS (SELECT cell, sum(cv * cv) AS cn2 FROM cb0 GROUP BY cell),
      d0 AS (SELECT u.vec_id, cb0.cell, sum(u.v * cb0.cv) AS dot
             FROM u JOIN cb0 ON u.i = cb0.dim GROUP BY 1, 2),
      a0 AS (SELECT vec_id, cell FROM (
               SELECT d.vec_id, d.cell,
                      row_number() OVER (PARTITION BY d.vec_id
                        ORDER BY round(n0.cn2 - 2.0 * d.dot, 6), d.cell) AS rk
               FROM d0 d JOIN n0 ON d.cell = n0.cell)
             WHERE rk = 1),
      cb1 AS (SELECT a.cell, u.i AS dim, round(avg(u.v), 6) AS cv
              FROM u JOIN a0 a ON u.vec_id = a.vec_id GROUP BY 1, 2),
      n1 AS (SELECT cell, sum(cv * cv) AS cn2 FROM cb1 GROUP BY cell),
      d1 AS (SELECT u.vec_id, cb1.cell, sum(u.v * cb1.cv) AS dot
             FROM u JOIN cb1 ON u.i = cb1.dim GROUP BY 1, 2),
      a1 AS (SELECT vec_id, cell FROM (
               SELECT d.vec_id, d.cell,
                      row_number() OVER (PARTITION BY d.vec_id
                        ORDER BY round(n1.cn2 - 2.0 * d.dot, 6), d.cell) AS rk
               FROM d1 d JOIN n1 ON d.cell = n1.cell)
             WHERE rk = 1),
      cb2 AS (SELECT a.cell, u.i AS dim, round(avg(u.v), 6) AS cv
              FROM u JOIN a1 a ON u.vec_id = a.vec_id GROUP BY 1, 2),
      n2 AS (SELECT cell, sum(cv * cv) AS cn2 FROM cb2 GROUP BY cell),
      d2 AS (SELECT u.vec_id, cb2.cell, sum(u.v * cb2.cv) AS dot
             FROM u JOIN cb2 ON u.i = cb2.dim GROUP BY 1, 2),
      fa AS (SELECT d.vec_id, d.cell,
                    row_number() OVER (PARTITION BY d.vec_id
                      ORDER BY round(n2.cn2 - 2.0 * d.dot, 6), d.cell) AS rk
             FROM d2 d JOIN n2 ON d.cell = n2.cell)"""

  private val q43 = Q(
    "q43_ann_ivf",
    ivfDF,
    Some(s"""
      WITH $ivfOracleCtes,
      assign AS (SELECT vec_id, cell FROM fa WHERE rk = 1),
      ua AS (SELECT u.vec_id, a.cell, u.i, u.v FROM u JOIN assign a ON u.vec_id = a.vec_id),
      pd AS (SELECT x.vec_id AS a_id, x.cell, y.vec_id AS b_id, sum(x.v * y.v) AS dot
             FROM ua x JOIN ua y
               ON x.i = y.i AND x.cell = y.cell AND x.vec_id <> y.vec_id
             GROUP BY 1, 2, 3),
      scored AS (SELECT a_id, cell, b_id, dot / (na.nrm * nb.nrm) AS cosine
                 FROM pd JOIN n na ON a_id = na.vec_id JOIN n nb ON b_id = nb.vec_id),
      ranked AS (SELECT a_id, CAST(cell AS BIGINT) AS cell, b_id AS nn_id, cosine,
                   row_number() OVER (PARTITION BY a_id
                     ORDER BY round(cosine, 6) DESC, b_id) AS rk
                 FROM scored)
      SELECT a_id, cell, nn_id, round(cosine, 4) AS cosine
      FROM ranked WHERE rk = 1
      ORDER BY a_id"""))

  /** Multi-probe IVF (nprobe = 2): every vector searches its TWO nearest
    * cells instead of one — the standard IVF recall knob. Corpus vectors
    * are indexed once in their home cell (rank-1 assignment); a query's
    * candidate set is every vector homed in either probed cell, so the
    * boundary-vector recall loss of single-probe IVF (nearest true
    * neighbor just across the Voronoi edge) is recovered at exactly 2×
    * the single-probe pairing cost — still n·√n total, same broadcast
    * codebook, same cell-local shuffles as q43. A pair can't double-count:
    * the candidate's HOME cell is unique, so (a, b) appears via at most
    * one probe.
    */
  private def ivfMultiprobeDF(s: SparkSession, d: String): DataFrame =
    ivfMultiprobeSearch(s, d, ivfCtx(s, d))

  private def ivfMultiprobeSearch(s: SparkSession, d: String, ctx: IvfCtx): DataFrame = {
      import s.implicits._
      val IvfCtx(u, n, cb) = ctx
      // cache the n×2 probe table so the assignment map runs once
      // (home is derived from it)
      val probed = assignCells(s, d, cb, nProbe = 2).cache()
      val probes = probed.select($"vec_id", $"cell")
      val home = probed.filter($"rk" === 1).select($"vec_id", $"cell")
      val a = u.join(probes, "vec_id")
        .select($"vec_id".as("a_id"), $"cell", $"i".as("ai"), $"v".as("av"))
      val b = u.join(home, "vec_id")
        .select($"vec_id".as("b_id"), $"cell".as("bc"), $"i".as("bi"), $"v".as("bv"))
      val dots = a.join(b, $"ai" === $"bi" && $"cell" === $"bc" && $"a_id" =!= $"b_id")
        .groupBy($"a_id", $"b_id")
        .agg(sum($"av" * $"bv").as("dot"))
      val scored = dots
        .join(broadcast(n.select($"vec_id".as("a_id"), $"nrm".as("an"))), "a_id")
        .join(broadcast(n.select($"vec_id".as("b_id"), $"nrm".as("bn"))), "b_id")
        .withColumn("cosine", $"dot" / ($"an" * $"bn"))
      scored.withColumn("rk", row_number().over(
          Window.partitionBy($"a_id").orderBy(r6($"cosine").desc, $"b_id")))
        .filter($"rk" === 1)
        .select($"a_id", $"b_id".as("nn_id"), r4($"cosine").as("cosine"))
        .orderBy($"a_id")
  }

  private val q44 = Q(
    "q44_ann_ivf_multiprobe",
    ivfMultiprobeDF,
    Some(s"""
      WITH $ivfOracleCtes,
      probes AS (SELECT vec_id, cell FROM fa WHERE rk <= 2),
      home AS (SELECT vec_id, cell FROM fa WHERE rk = 1),
      pd AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, sum(x.v * y.v) AS dot
             FROM (SELECT p.vec_id, p.cell, u.i, u.v
                   FROM u JOIN probes p ON u.vec_id = p.vec_id) x
             JOIN (SELECT h.vec_id, h.cell, u.i, u.v
                   FROM u JOIN home h ON u.vec_id = h.vec_id) y
               ON x.i = y.i AND x.cell = y.cell AND x.vec_id <> y.vec_id
             GROUP BY 1, 2),
      scored AS (SELECT a_id, b_id, dot / (na.nrm * nb.nrm) AS cosine
                 FROM pd JOIN n na ON a_id = na.vec_id JOIN n nb ON b_id = nb.vec_id),
      rnk AS (SELECT a_id, b_id AS nn_id, cosine,
                row_number() OVER (PARTITION BY a_id
                  ORDER BY round(cosine, 6) DESC, b_id) AS rk
              FROM scored)
      SELECT a_id, nn_id, round(cosine, 4) AS cosine
      FROM rnk WHERE rk = 1
      ORDER BY a_id"""))

  /** Recall@1 report: how often each approximate tier (q41 LSH, q43
    * IVF, q44 multi-probe IVF) returns the TRUE nearest neighbor (q40
    * brute force) for the fixed query set (vec_id < 10). A query whose
    * approximate tier returns nothing (bucket dropped / singleton cell)
    * counts as a miss — that IS the recall cost of the blocking scheme.
    * Everything here is deterministic (rounded scores, id tiebreaks),
    * so the report is oracle-checkable end-to-end: the quality dial for
    * the `bits` / `nprobe` / Lloyd-iteration knobs is itself a tested
    * query, not a side-channel script. (No reference analog — the
    * LLM-pipeline completeness item from the round-2 review.)
    */
  private val q45 = Q(
    "q45_ann_recall",
    (s, d) => {
      import s.implicits._
      val gt = bruteforceDF(s, d).filter($"rk" === 1)
        .select($"q_id", $"n_id".as("true_nn"))
      def recallOf(method: String, df: DataFrame) =
        gt.join(df.select($"a_id".as("q_id"), $"nn_id"), Seq("q_id"), "left")
          .agg(count(lit(1)).as("n_queries"),
            sum(when($"nn_id" === $"true_nn", 1L).otherwise(0L)).as("hits"))
          .select(lit(method).as("method"),
            $"n_queries".cast("long").as("n_queries"),
            $"hits".cast("long").as("hits"),
            r4($"hits".cast("double") / $"n_queries").as("recall_at_1"))
      // ONE shared IVF context: both searches reuse the same refined
      // codebook (and the cached unpacked/norm tables) instead of
      // paying for two identical refinements
      val ctx = ivfCtx(s, d)
      recallOf("ivf", ivfSearch(s, d, ctx))
        .unionAll(recallOf("ivf_multiprobe", ivfMultiprobeSearch(s, d, ctx)))
        .unionAll(recallOf("lsh", lshDF(s, d)))
        .orderBy($"method")
    },
    Some(s"""
      WITH gt AS (SELECT q_id, n_id AS true_nn
                  FROM (${q40.oracle.get}) bf WHERE rk = 1),
      m_lsh AS (SELECT a_id, nn_id FROM (${q41.oracle.get}) x),
      m_ivf AS (SELECT a_id, nn_id FROM (${q43.oracle.get}) x),
      m_mp AS (SELECT a_id, nn_id FROM (${q44.oracle.get}) x),
      r AS (
        SELECT 'ivf' AS method, CAST(count(*) AS BIGINT) AS n_queries,
               CAST(sum(CASE WHEN m.nn_id = gt.true_nn THEN 1 ELSE 0 END) AS BIGINT) AS hits
        FROM gt LEFT JOIN m_ivf m ON gt.q_id = m.a_id
        UNION ALL
        SELECT 'ivf_multiprobe', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN m.nn_id = gt.true_nn THEN 1 ELSE 0 END) AS BIGINT)
        FROM gt LEFT JOIN m_mp m ON gt.q_id = m.a_id
        UNION ALL
        SELECT 'lsh', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN m.nn_id = gt.true_nn THEN 1 ELSE 0 END) AS BIGINT)
        FROM gt LEFT JOIN m_lsh m ON gt.q_id = m.a_id)
      SELECT method, n_queries, hits,
             round(CAST(hits AS DOUBLE) / n_queries, 4) AS recall_at_1
      FROM r ORDER BY method"""))

  /** Symmetric int8 scalar quantization of the embedding column — the
    * standard 4× storage/IO cut for large vector stores (per-vector
    * max-abs scale, q = round(v/scale·127)) — reported as per-label
    * reconstruction error (RMSE + worst-case) so the compression is a
    * measured decision, not a guess. All row-local except one tiny
    * per-vector scale agg and the final per-label agg; both engines
    * compute the identical round-half-up quantizer (floor(x + 0.5)),
    * so the report is hash-checked. Zero vectors quantize to zero
    * (scale 0 guard) rather than NaN.
    */
  private val q46 = Q(
    "q46_embedding_quantization",
    (s, d) => {
      import s.implicits._
      val u = unpacked(s, d)
      val mx = u.groupBy($"vec_id").agg(max(abs($"v")).as("mx"))
      val qd = u.join(mx, "vec_id")
        .withColumn("dq", when($"mx" === 0, 0.0)
          .otherwise(floor($"v" / $"mx" * 127 + 0.5) * $"mx" / 127))
      qd.groupBy($"label")
        .agg(count(lit(1)).as("n_vals"),
          r6(sqrt(avg(($"v" - $"dq") * ($"v" - $"dq")))).as("rmse"),
          r6(max(abs($"v" - $"dq"))).as("max_err"))
        .orderBy($"label")
    },
    Some("""
      WITH u AS (SELECT vec_id, label,
                   generate_subscripts(embedding, 1) AS i,
                   unnest(embedding)::DOUBLE AS v
                 FROM embeddings),
      mx AS (SELECT vec_id, max(abs(v)) AS mx FROM u GROUP BY vec_id),
      qd AS (SELECT u.label, u.v,
               CASE WHEN mx.mx = 0 THEN 0.0
                    ELSE floor(u.v / mx.mx * 127 + 0.5) * mx.mx / 127 END AS dq
             FROM u JOIN mx ON u.vec_id = mx.vec_id)
      SELECT label, count(*) AS n_vals,
             round(sqrt(avg((v - dq) * (v - dq))), 6) AS rmse,
             round(max(abs(v - dq)), 6) AS max_err
      FROM qd
      GROUP BY label
      ORDER BY label"""))

  val all: Seq[Q] = Seq(q40, q41, q42, q43, q44, q45, q46)
}
