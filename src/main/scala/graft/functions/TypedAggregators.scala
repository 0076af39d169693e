package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator API demos (SURVEY.md §7.3): the Dataset-typed face of
  * the same Tungsten partial+final aggregation the DataFrame operators
  * use. Useful when callers live in `Dataset[T]` land and want
  * compile-time checked aggregation logic. */
object TypedAggregators {

  /** Count occurrences (the reference's O6 as a typed Aggregator). */
  object CountAgg extends Aggregator[String, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: String): Long = b + 1
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Numerically stable mean/variance (Welford merge) over doubles. */
  case class Moments(n: Long, mean: Double, m2: Double)
  object VarianceAgg extends Aggregator[Double, Moments, Double] {
    override def zero: Moments = Moments(0, 0.0, 0.0)
    override def reduce(b: Moments, x: Double): Moments = {
      val n = b.n + 1
      val d = x - b.mean
      val mean = b.mean + d / n
      Moments(n, mean, b.m2 + d * (x - mean))
    }
    override def merge(a: Moments, b: Moments): Moments = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        Moments(n, a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    override def finish(r: Moments): Double =
      if (r.n < 2) Double.NaN else r.m2 / (r.n - 1)
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
