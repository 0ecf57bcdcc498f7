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

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`). At 100 TB the approx_percentile sketch replaces
    * this; the exact form is the correctness oracle.
    */
  private val q22 = Q(
    "q22_percentiles",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          r4(expr("percentile(l_extendedprice, 0.5)")).as("p50"),
          r4(expr("percentile(l_extendedprice, 0.9)")).as("p90"),
          r4(expr("percentile(l_quantity, 0.25)")).as("q1_qty"))
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

  val all: Seq[Q] = Seq(q21, q22, q23)
}
