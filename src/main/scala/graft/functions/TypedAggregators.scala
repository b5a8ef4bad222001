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

  final case class KeyCount(key: String, n: Long)

  /** Misra–Gries frequent-items sketch as a typed Aggregator — the
    * "frequent" member of the sketch family next to count-min (point
    * estimates), HLL (distinct) and the min-k sample: at most `k` counters
    * per buffer, and every item with true frequency > n/(k+1) is GUARANTEED
    * to survive (no false negatives; counts are underestimates by at most
    * n/(k+1)). The classic stream algorithm: a miss on a full buffer
    * decrements ALL counters (pairing the new item against k incumbents);
    * the merge (Agarwal et al., "Mergeable Summaries") adds counters then
    * subtracts the (k+1)-largest count — the bound degrades by addition,
    * never breaks.
    *
    * Use for "top sources / hot keys / trending tokens over a 100 TB
    * stream" where exact groupBy counts of a high-cardinality key would
    * shuffle the world: the buffer is k entries per partition regardless
    * of input size, and the result is a CANDIDATE set to verify with one
    * cheap semi-join (the q125 count-min pattern).
    *
    * Deterministic caveat: the surviving counter VALUES depend on arrival
    * order (any MG does); the guarantees above do not.
    */
  def misraGries(k: Int): Aggregator[String, Map[String, Long], Seq[KeyCount]] = {
    require(k > 0, s"k=$k must be positive")
    new Aggregator[String, Map[String, Long], Seq[KeyCount]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(b: Map[String, Long], x: String): Map[String, Long] =
        b.get(x) match {
          case Some(c) => b.updated(x, c + 1)
          case None if b.size < k => b.updated(x, 1L)
          case None => // decrement-all: the new item annihilates one of each
            b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
        }
      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val sum = b.foldLeft(a) { case (m, (key, c)) =>
          m.updated(key, m.getOrElse(key, 0L) + c)
        }
        if (sum.size <= k) sum
        else {
          // subtract the (k+1)-th largest count, drop what hits zero
          val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
          sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
        }
      }
      def finish(b: Map[String, Long]): Seq[KeyCount] =
        b.toSeq.sortBy { case (key, c) => (-c, key) }.map(KeyCount.tupled)
      def bufferEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
      def outputEncoder: Encoder[Seq[KeyCount]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyCount]]()
    }
  }
}
