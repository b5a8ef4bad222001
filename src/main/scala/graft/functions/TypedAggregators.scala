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

  final case class HashedId(h: String, id: Long)

  /** Per-group bottom-k-by-md5 sample — the group-keyed form of
    * [[graft.operators.SampleSketch]], as a typed `Aggregator` so the
    * buffer is BOUNDED at k (hash, id) pairs per group regardless of group
    * size: reduce inserts only when the hash beats the current k-th, merge
    * is the min-k law. The scale contrast is with `collect_list`-then-slice
    * (buffer grows with the group) and with a per-group rank window (sorts
    * the whole group to keep k rows). Ids return in hash order — a
    * deterministic uniform sample of each group, reproducible on any
    * engine (the md5 rank is the randomness).
    */
  def groupBottomK(k: Int): Aggregator[Long, Seq[HashedId], Seq[Long]] = {
    require(k > 0, s"k=$k must be positive")
    new Aggregator[Long, Seq[HashedId], Seq[Long]] {
      private def md5hex(s: String): String = {
        val d = java.security.MessageDigest.getInstance("MD5").digest(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        d.map(b => f"$b%02x").mkString
      }
      private def trim(b: Seq[HashedId]): Seq[HashedId] =
        b.sortBy(x => (x.h, x.id)).take(k)
      def zero: Seq[HashedId] = Seq.empty
      def reduce(b: Seq[HashedId], id: Long): Seq[HashedId] = {
        val h = md5hex(id.toString)
        // bounded insert: skip the sort entirely when the buffer is full
        // and the candidate can't beat the current k-th hash
        if (b.length >= k && h >= b.last.h) b else trim(b :+ HashedId(h, id))
      }
      def merge(a: Seq[HashedId], b: Seq[HashedId]): Seq[HashedId] = trim(a ++ b)
      def finish(b: Seq[HashedId]): Seq[Long] = b.map(_.id)
      def bufferEncoder: Encoder[Seq[HashedId]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedId]]()
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
  }
}
