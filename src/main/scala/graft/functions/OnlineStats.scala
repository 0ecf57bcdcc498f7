package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (the §2.7 UDAF surface): single-pass online
  * mean/variance via Chan et al.'s parallel Welford merge — the
  * numerically-stable form that survives partial aggregation, which is
  * exactly what a custom `Aggregator[IN, BUF, OUT]` must handle at
  * scale (executors reduce partials, then merge across partitions).
  */
object OnlineStats {

  final case class Moments(n: Long, mean: Double, m2: Double)

  /** (count, mean, population variance) of a Double column. */
  val momentsAgg: Aggregator[Double, Moments, Moments] =
    new Aggregator[Double, Moments, Moments] {
      override def zero: Moments = Moments(0L, 0.0, 0.0)

      override def reduce(b: Moments, x: Double): Moments = {
        val n = b.n + 1
        val d = x - b.mean
        val mean = b.mean + d / n
        Moments(n, mean, b.m2 + d * (x - mean))
      }

      override def merge(a: Moments, b: Moments): Moments =
        if (a.n == 0) b
        else if (b.n == 0) a
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          Moments(n,
            a.mean + d * b.n / n,
            a.m2 + b.m2 + d * d * a.n * b.n / n)
        }

      override def finish(r: Moments): Moments = r
      override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
    }
}
