package graft.operators

import graft.{Q, Cols, Tables}
import Cols._
import Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64-dim).
  *
  * Three tiers:
  *  - q40: brute-force cosine top-k — the correctness baseline. The
  *    query set broadcasts; the candidate scan streams, so at 100 TB
  *    this is one pass over the corpus with a per-partition heap
  *    (TakeOrdered per query key), no cross-shuffle.
  *  - q41: sign-bit LSH buckets (random-hyperplane style with axis
  *    hyperplanes for determinism) — the scale path: pairing happens
  *    only inside buckets.
  *  - q42: per-label centroids — the IVF coarse-quantizer building
  *    block (k-means assignment step's reduce side).
  *
  * Dot products run through codegen'd higher-order functions
  * (`zip_with` + `aggregate`) on double-cast arrays — no UDF, no Python.
  */
object Similarity {

  private val vectorized =
    """transform(embedding, x -> cast(x as double))"""
  private val normOf =
    """sqrt(aggregate(v, cast(0.0 as double), (a, x) -> a + x*x))"""
  private val dotAvBv =
    """aggregate(zip_with(av, bv, (x, y) -> x*y), cast(0.0 as double), (acc, x) -> acc + x)"""

  /** Brute-force cosine top-5 for a fixed query set (vec_id < 10). */
  private val q40 = Q(
    "q40_ann_bruteforce",
    (s, d) => {
      import s.implicits._
      val e = t(s, d, "embeddings")
        .select($"vec_id", expr(vectorized).as("v"))
        .withColumn("nrm", expr(normOf))
      val qs = e.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"v".as("av"), $"nrm".as("qnrm"))
      val cand = e.select($"vec_id".as("n_id"), $"v".as("bv"), $"nrm".as("cnrm"))
      val scored = qs.join(broadcast(cand), $"q_id" =!= $"n_id")
        .withColumn("cosine", expr(dotAvBv) / ($"qnrm" * $"cnrm"))
      val w = Window.partitionBy($"q_id")
        .orderBy(round($"cosine", 6).desc, $"n_id")
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 5)
        .select($"q_id", $"rk", $"n_id", r4($"cosine").as("cosine"))
        .orderBy($"q_id", $"rk")
    },
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

  /** Sign-bit LSH: bucket on the sign pattern of the first 4 dims
    * (16 buckets), nearest neighbor inside the bucket only.
    */
  private val q41 = Q(
    "q41_ann_lsh_bucket",
    (s, d) => {
      import s.implicits._
      val bucketExpr =
        """(CASE WHEN element_at(v, 1) > 0 THEN 1 ELSE 0 END)
         + (CASE WHEN element_at(v, 2) > 0 THEN 2 ELSE 0 END)
         + (CASE WHEN element_at(v, 3) > 0 THEN 4 ELSE 0 END)
         + (CASE WHEN element_at(v, 4) > 0 THEN 8 ELSE 0 END)"""
      val e = t(s, d, "embeddings")
        .select($"vec_id", expr(vectorized).as("v"))
        .withColumn("nrm", expr(normOf))
        .withColumn("bucket", expr(bucketExpr).cast("long"))
      val a = e.select($"vec_id".as("a_id"), $"v".as("av"),
        $"nrm".as("anrm"), $"bucket")
      val b = e.select($"vec_id".as("b_id"), $"v".as("bv"),
        $"nrm".as("bnrm"), $"bucket".as("bk"))
      val scored = a.join(b, $"bucket" === $"bk" && $"a_id" =!= $"b_id")
        .withColumn("cosine", expr(dotAvBv) / ($"anrm" * $"bnrm"))
      val w = Window.partitionBy($"a_id")
        .orderBy(round($"cosine", 6).desc, $"b_id")
      scored.withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"a_id", $"bucket", $"b_id".as("nn_id"),
          r4($"cosine").as("cosine"))
        .orderBy($"a_id")
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding,
                   (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                 + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
                 + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
                 + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
                 FROM embeddings),
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
    * IVF/k-means coarse quantizer. posexplode + two-key hash agg; at
    * scale this is rows×dims but aggregates map-side to labels×dims.
    */
  private val q42 = Q(
    "q42_label_centroids",
    (s, d) => {
      import s.implicits._
      t(s, d, "embeddings")
        .select($"label", posexplode(expr(vectorized)))
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

  val all: Seq[Q] = Seq(q40, q41, q42)
}
