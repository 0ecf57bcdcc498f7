package graft.operators

import graft.{Q, Cols, Tables}
import Cols._
import Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64-dim).
  *
  * Three tiers:
  *  - q40: brute-force cosine top-k — the correctness baseline.
  *  - q41: sign-bit LSH buckets (axis hyperplanes for determinism) —
  *    the scale path: pairing happens only inside buckets.
  *  - q42: per-label centroids — the IVF coarse-quantizer building
  *    block (k-means assignment step's reduce side).
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
    * with the 4-bit sign bucket attached. Cached (multi-consumer).
    */
  private def unpacked(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)
      .select($"vec_id", $"label",
        expr("""(CASE WHEN embedding[0] > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN embedding[1] > 0 THEN 2 ELSE 0 END)
              + (CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END)
              + (CASE WHEN embedding[3] > 0 THEN 8 ELSE 0 END)""")
          .cast("long").as("bucket"),
        posexplode(expr("transform(embedding, x -> cast(x as double))")))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "v")
      .cache()
  }

  private def norms(u: DataFrame): DataFrame =
    u.groupBy("vec_id").agg(sqrt(sum(expr("v * v"))).as("nrm"))

  /** Brute-force cosine top-5 for a fixed query set (vec_id < 10). */
  private val q40 = Q(
    "q40_ann_bruteforce",
    (s, d) => {
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
      val u = unpacked(s, d)
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

  /** IVF-style ANN: coarse-quantize every vector to its NEAREST centroid
    * (the q42 codebook — label-partitioned means standing in for k-means
    * cells), then search only inside the assigned cell. Assignment
    * minimizes ‖c‖²−2·⟨v,c⟩ (≡ squared distance, per-vector constant
    * dropped), rounded + label-tiebroken for engine determinism. The
    * scale story: the codebook broadcasts, assignment is one pass over
    * the corpus, and pairing is cell-local — the standard IVF trade of
    * recall for a ~#cells× search-cost cut.
    */
  private val q43 = Q(
    "q43_ann_ivf",
    (s, d) => {
      import s.implicits._
      val u = unpacked(s, d)
      val n = norms(u)
      val cents = u.groupBy($"label".as("cl"), $"i".as("ci"))
        .agg(avg($"v").as("c"))
      val cn2 = cents.groupBy($"cl").agg(sum($"c" * $"c").as("cn2"))
      val assign = u
        .join(broadcast(cents), $"i" === $"ci")
        .groupBy($"vec_id", $"cl")
        .agg(sum($"v" * $"c").as("dot"))
        .join(broadcast(cn2), "cl")
        .withColumn("score", $"cn2" - lit(2.0) * $"dot")
        .withColumn("rk", row_number().over(
          Window.partitionBy($"vec_id").orderBy(r6($"score").asc, $"cl".asc)))
        .filter($"rk" === 1)
        .select($"vec_id", $"cl".as("cell"))
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
    },
    Some("""
      WITH u AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
                   unnest(embedding)::DOUBLE AS v FROM embeddings),
      n AS (SELECT vec_id,
              sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
            FROM embeddings),
      cents AS (SELECT label AS cl, i AS ci, avg(v) AS c FROM u GROUP BY 1, 2),
      cn2 AS (SELECT cl, sum(c * c) AS cn2 FROM cents GROUP BY cl),
      dots AS (SELECT u.vec_id, cents.cl, sum(u.v * cents.c) AS dot
               FROM u JOIN cents ON u.i = cents.ci
               GROUP BY 1, 2),
      assign AS (SELECT vec_id, cl AS cell FROM (
                   SELECT d.vec_id, d.cl,
                          row_number() OVER (PARTITION BY d.vec_id
                            ORDER BY round(cn2.cn2 - 2.0 * d.dot, 6), d.cl) AS rk
                   FROM dots d JOIN cn2 ON d.cl = cn2.cl)
                 WHERE rk = 1),
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

  val all: Seq[Q] = Seq(q40, q41, q42, q43)
}
