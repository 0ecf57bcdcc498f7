package graft.operators

import graft.{Q, Cols, Tables}
import Cols._
import Tables.t
import org.apache.spark.sql.functions._

/** Statistical aggregation surface — the eddy-covariance flux math the
  * reference's downstream batch side performs over packed windows
  * (SURVEY.md §2.4: "means/variances/covariances over the 10-min
  * windows"), served by Spark's native hash aggregates.
  */
object Stats {

  /** Variance / covariance / correlation per group — single-pass
    * declarative aggregates, map-side partial at scale.
    */
  private val q21 = Q(
    "q21_flux_stats",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          r4(stddev_samp($"l_quantity")).as("sd_qty"),
          r6(var_pop($"l_discount")).as("var_disc"),
          r6(corr($"l_quantity", $"l_extendedprice")).as("corr_qp"),
          r2(covar_pop($"l_quantity", $"l_extendedprice")).as("cov_qp"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             round(stddev_samp(l_quantity), 4)               AS sd_qty,
             round(var_pop(l_discount), 6)                   AS var_disc,
             round(corr(l_quantity, l_extendedprice), 6)     AS corr_qp,
             round(covar_pop(l_quantity, l_extendedprice), 2) AS cov_qp
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Exact interpolated percentiles (≡ DuckDB `quantile_cont`) via a
    * RANGE-PARTITIONED two-pass rank — the only exact form that
    * survives 100 TB:
    *
    *  - Spark's built-in `percentile` aggregate collects a per-group
    *    value map into each buffer and merges single-threaded (60 s at
    *    sf0.1);
    *  - the round-2 `Window.partitionBy(group).orderBy(v)` form sorted
    *    each group in ONE task — with 3 hot returnflag values at 100 TB
    *    that is ~33 TB through a single reducer.
    *
    * Here rows are `repartitionByRange(group, v)` — every partition owns
    * a contiguous (group, value) slice, partition count scales with the
    * cluster, and the per-partition sort is local and spillable. Pass 1
    * collects per-(partition, group) row counts (P×|groups| scalars);
    * cumulative sums give each partition its group's global rank offset,
    * so pass 2 assigns exact global ranks with zero additional shuffle.
    * The interpolation `p = v_lo + (v_hi − v_lo)·frac` (DuckDB
    * quantile_cont's exact IEEE form — the algebraically-equal
    * `v_lo·(1−frac) + v_hi·frac` can differ by an ulp and flip the r4
    * floor at a boundary) then reads the two contributing ranks through
    * an ordinary two-phase hash agg. (The sketch alternative,
    * approx_percentile, has no engine-portable oracle — it stays the
    * production path in q26.)
    */
  private val q22 = Q(
    "q22_percentiles",
    (s, d) => {
      import s.implicits._
      def pctls(valCol: String, ps: Seq[(String, Double)]) = {
        val ranged = TwoPass.rangedPinned(
          t(s, d, "lineitem")
            .select($"l_returnflag".as("g"), col(valCol).cast("double").as("v"))
            .as[(String, Double)],
          $"g", $"v")
        val (offsets, totals) = TwoPass.groupOffsets(ranged)(_._1)
        val bOff = s.sparkContext.broadcast(offsets)
        val bTot = s.sparkContext.broadcast(totals)
        // pass 2: global rank = partition offset + local (sorted) index
        val ranked = TwoPass.withPid(ranged) { (pid, it) =>
          val local = scala.collection.mutable.HashMap[String, Long]()
          it.map { case (g, v) =>
            val rn = local.getOrElse(g, 0L) + 1L
            local.update(g, rn)
            (g, v, bOff.value.getOrElse((pid, g), 0L) + rn, bTot.value(g))
          }
        }.toDF("g", "v", "rn", "n")
        val aggs = ps.map { case (name, p) =>
          val pos = (col("n") - 1) * lit(p)          // 0-based fractional rank
          val lo = floor(pos) + 1
          val frac = pos - floor(pos)
          val hi = lo + when(frac > 0, 1).otherwise(0)
          val vlo = sum(when(col("rn") === lo, col("v")).otherwise(0.0))
          val vhi = sum(when(col("rn") === hi, col("v")).otherwise(0.0))
          r4(vlo + (vhi - vlo) * max(frac)).as(name)
        }
        ranked.groupBy($"g").agg(aggs.head, aggs.tail: _*)
          .withColumnRenamed("g", "l_returnflag")
      }
      // the two value columns' rank pipelines are independent until the
      // final join, and each runs driver-blocking jobs while it builds
      // (range-sampling + the pass-1 offsets collect): overlap them on
      // driver threads so one pipeline's jobs back-fill the other's
      // stragglers (guide §2.6) instead of serializing 2× the latency
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val priceF = Future(pctls("l_extendedprice", Seq("p50" -> 0.5, "p90" -> 0.9)))
      val qtyF = Future(pctls("l_quantity", Seq("q1_qty" -> 0.25)))
      Await.result(priceF, Duration.Inf)
        .join(Await.result(qtyF, Duration.Inf), "l_returnflag")
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
             round(quantile_cont(l_quantity, 0.25), 4)     AS q1_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Fixed-width histogram via portable integer bucketing. */
  private val q23 = Q(
    "q23_histogram",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .groupBy(expr(
          "CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT)").as("bucket"))
        .agg(count(lit(1)).as("n"), r2(sum($"o_totalprice")).as("total"))
        .orderBy($"bucket")
    },
    Some("""
      SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bucket,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      GROUP BY 1
      ORDER BY bucket"""))

  /** Custom typed Aggregator (§2.7 UDAF surface): online Welford
    * moments registered as a UDAF and applied per group; oracle-checked
    * against the engine-native avg/var_pop (same math, different
    * accumulation — rounded to absorb fp association differences).
    */
  private val q27 = Q(
    "q27_custom_aggregator",
    (s, d) => {
      import s.implicits._
      val moments = udaf(graft.functions.OnlineStats.momentsAgg)
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(moments($"l_quantity").as("m"))
        .select($"l_returnflag",
          $"m.n".as("n"),
          r6($"m.mean").as("mean_qty"),
          r4(($"m.m2" / $"m.n")).as("var_qty"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
             round(avg(l_quantity), 6)     AS mean_qty,
             round(var_pop(l_quantity), 4) AS var_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Skew-mitigated aggregation (the 100 TB salting pattern): lineitem's
    * 3 returnflag values are pathological hot keys at scale — 3 reducers
    * would own 100 TB. Phase 1 groups by (key, salt) so partials spread
    * over key×16 reducers; phase 2 combines per key. Results are
    * identical to the direct aggregation (the oracle), because sum/count
    * are associative — which is exactly what makes salting legal.
    * (Locally Spark's map-side partial agg already handles this; the
    * explicit form is the cluster pattern, oracle-checked.)
    */
  private val q28 = Q(
    "q28_salted_agg",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .withColumn("salt", pmod($"l_orderkey", lit(16)))
        .groupBy($"l_returnflag", $"salt")
        .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("rev_part"),
          count(lit(1)).as("n_part"))
        .groupBy($"l_returnflag")
        .agg(r2(sum($"rev_part")).as("revenue"),
          sum($"n_part").as("n_items"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  val all: Seq[Q] = Seq(q21, q22, q23, q27, q28)
}
