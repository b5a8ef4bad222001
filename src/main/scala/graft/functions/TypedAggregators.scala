package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s — the `Dataset[T]` counterpart of the column-level
  * operators, for pipelines that want compile-time row types
  * (`ds.groupByKey(...).agg(TypedAggregators.meanStd.toColumn)`).
  */
object TypedAggregators {

  final case class MomentBuf(n: Long, sum: Double, sumSq: Double)
  final case class MeanStd(mean: Double, std: Double)

  /** Single-pass mean + population standard deviation. */
  val meanStd: Aggregator[Double, MomentBuf, MeanStd] =
    new Aggregator[Double, MomentBuf, MeanStd] {
      def zero: MomentBuf = MomentBuf(0L, 0.0, 0.0)
      def reduce(b: MomentBuf, x: Double): MomentBuf =
        MomentBuf(b.n + 1, b.sum + x, b.sumSq + x * x)
      def merge(a: MomentBuf, b: MomentBuf): MomentBuf =
        MomentBuf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)
      def finish(b: MomentBuf): MeanStd =
        if (b.n == 0) MeanStd(0.0, 0.0)
        else {
          val m = b.sum / b.n
          MeanStd(m, math.sqrt(math.max(b.sumSq / b.n - m * m, 0.0)))
        }
      def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
      def outputEncoder: Encoder[MeanStd] = Encoders.product[MeanStd]
    }

  /** Element-wise vector sum (embedding accumulation — e.g. centroid
    * numerators) as a typed aggregator.
    */
  val vectorSum: Aggregator[Seq[Double], Seq[Double], Seq[Double]] =
    new Aggregator[Seq[Double], Seq[Double], Seq[Double]] {
      def zero: Seq[Double] = Seq.empty
      private def add(a: Seq[Double], b: Seq[Double]): Seq[Double] =
        if (a.isEmpty) b else if (b.isEmpty) a else a.zip(b).map(p => p._1 + p._2)
      def reduce(b: Seq[Double], x: Seq[Double]): Seq[Double] = add(b, x)
      def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = add(a, b)
      def finish(b: Seq[Double]): Seq[Double] = b
      def bufferEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
      def outputEncoder: Encoder[Seq[Double]] = bufferEncoder
    }
}
