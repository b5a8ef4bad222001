package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting: each token hashes to 64 bits; for every
  * bit position the tokens vote +1/−1; the sign vector is the fingerprint.
  * Near-duplicates differ in few bits (small Hamming distance).
  *
  * Bits come from the md5 hex digest: hex char j/4 of the token's digest,
  * bit 3−(j%4) within it — reproducible in any engine with md5 + arithmetic
  * (no engine-specific hash). The fingerprint is emitted as a 64-char
  * '0'/'1' string: engine-portable, and Hamming distance is a cheap
  * per-char comparison.
  */
object SimHash {

  val Bits = 64

  /** 0–15 value of the 1-based `idx` hex char of a digest string. */
  private def hexDigitAt(digest: Column, idx: Column): Column =
    conv(digest.substr(idx, lit(1)), 16, 10).cast("long")

  /** 64-bit simhash of the text's tokens, as a '0'/'1' bitstring.
    * Each token is md5'd ONCE (not once per bit) — the digest array is a
    * shared subexpression across all 64 bit positions.
    */
  def simhashBits(c: Column): Column = {
    val digests = transform(TextAnalysis.tokens(c), t => md5(t))
    val bits = transform(sequence(lit(0), lit(Bits - 1)), j => {
      val hexIdx = (j / lit(4)) + 1 // which hex char of the digest
      val shift = lit(3) - (j % lit(4)) // which bit within that hex char
      val vote = aggregate(
        digests,
        lit(0L),
        (acc, d) => {
          val digit = hexDigitAt(d, hexIdx)
          // (digit >> shift) & 1 with a Column-valued shift: divide by 2^shift
          val bit = floor(digit / pow(lit(2.0), shift)).cast("long") % 2
          acc + (bit * 2 - 1)
        })
      when(vote > 0, lit("1")).otherwise(lit("0"))
    })
    concat_ws("", bits)
  }

  /** Hamming distance between two equal-length bitstrings. */
  def hammingDistance(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y), x => x))

  /** Per-document fingerprint table via the scalable explode → sum-aggregate
    * shape: one md5 per TOKEN ROW (not per token×bit — interpreted
    * higher-order lambdas would re-evaluate the digest 64×), then 64 ±1 vote
    * sums with map-side combine. One shuffle of 64 longs per doc. Token-less
    * docs get the all-zero fingerprint, matching [[simhashBits]].
    */
  def fingerprintTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // a corpus read from few parquet files arrives in few partitions; spread
    // the 64-bit vote computation across the cluster up front — hashing by id
    // also pre-partitions for the groupBy below (no second exchange)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val tok = df.repartition(parts, col(idCol))
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("_tok"))
    // the digest's first 16 hex chars decoded as TWO 32-bit words per token
    // row (two conv() parses, not one per hex digit); the 64 vote aggregates
    // then only shift+mask. Bit j of the fingerprint = bit 31-(j%32) of word
    // j/32 — the same MSB-first reading as per-digit decoding.
    val withWords = tok
      .select(col(idCol), md5(col("_tok")).as("_d"))
      .select(
        col(idCol),
        conv(substring(col("_d"), 1, 8), 16, 10).cast("long").as("_h0"),
        conv(substring(col("_d"), 9, 8), 16, 10).cast("long").as("_h1"))
    val voteAggs = (0 until Bits).map { j =>
      val word = col(if (j < 32) "_h0" else "_h1")
      val bit = shiftright(word, 31 - (j % 32)).bitwiseAND(lit(1L))
      sum(bit * 2 - 1).as(s"_v$j")
    }
    val votes = withWords.groupBy(col(idCol)).agg(voteAggs.head, voteAggs.tail: _*)
    val bitCols = (0 until Bits).map(j => when(col(s"_v$j") > 0, lit("1")).otherwise(lit("0")))
    // packed-long twin of the bitstring: disjoint powers of two, so the sum
    // is a bitwise OR — enables bit_count(xor) Hamming in the pair join
    val packed = (0 until Bits).map(j =>
      when(col(s"_v$j") > 0, shiftleft(lit(1L), Bits - 1 - j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val withFp = votes.select(col(idCol), concat(bitCols: _*).as("_fp"), packed.as("_fpl"))
    // docs with zero tokens dropped out at explode: restore with all-zero fp
    df.select(col(idCol)).join(withFp, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("_fp"), lit("0" * Bits)).as("_fp"),
        coalesce(col("_fpl"), lit(0L)).as("_fpl"))
  }

  /** Near-duplicate pairs: docs whose simhash differs in ≤ maxHamming bits.
    * Blocking: split the fingerprint into (maxHamming+1) segments — any pair
    * within the threshold shares at least one exact segment (pigeonhole), so
    * the join is an equi-join on (segment index, segment value), never a
    * cross product. This is the standard scalable simhash index: at 100 TB
    * the shuffle is keyed by segment value and only near-identical docs meet.
    */
  def nearDuplicatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    // the fingerprint table feeds three plan branches (segments + both join
    // probes); cache it — it is tiny (one row per doc) and saves recomputing
    // the token-explode aggregation per branch
    val fp = fingerprintTable(df, idCol, textCol).persist()
    pairsFromFingerprints(fp, idCol, "_fp", "_fpl", Bits, maxHamming)
  }

  /** Packed 64-bit long of a '0'/'1' bitstring column: two 32-bit `conv`
    * parses, the high word shifted into the sign half — two's complement
    * keeps the bit pattern lossless, which is all `bit_count(xor)` needs.
    * Bridges ANY 64-bit fingerprint (simhash, image aHash, …) into the
    * pigeonhole pair join below.
    */
  def packBits64(fpCol: Column): Column =
    shiftleft(conv(fpCol.substr(1, 32), 2, 10).cast("long"), 32)
      .bitwiseOR(conv(fpCol.substr(33, 32), 2, 10).cast("long"))

  /** Hamming-bounded pairs from ANY precomputed fingerprint table — the
    * modality-independent core of the simhash index, reused verbatim for
    * image aHashes (q128): split the `bits`-length bitstring into
    * (maxHamming+1) segments; a pair within the threshold shares ≥ 1 exact
    * segment (pigeonhole), so candidates come from an equi-join on
    * (segment index, value), never a cross product. Hamming (one codegen'd
    * bit_count over the packed longs) runs BEFORE the distinct: hot buckets
    * can produce millions of collision rows, and deduplicating those costs
    * far more than filtering them — the distinct then only sees the
    * ≤(maxHamming+1)-fold duplicates of true pairs.
    */
  def pairsFromFingerprints(
      fp: DataFrame,
      idCol: String,
      fpCol: String,
      fplCol: String,
      bits: Int = Bits,
      maxHamming: Int = 3): DataFrame = {
    val segs = maxHamming + 1
    val segLen = bits / segs
    require(segLen > 0, s"maxHamming=$maxHamming too large for $bits-bit fingerprints")
    val seg = fp.select(
      col(idCol),
      col(fplCol),
      posexplode(transform(sequence(lit(0), lit(segs - 1)), i =>
        col(fpCol).substr(i * lit(segLen) + 1, lit(segLen)))).as(Seq("seg_i", "seg_v")))
    val a = seg.select(col("seg_i"), col("seg_v"), col(idCol).as("id_a"), col(fplCol).as("_la"))
    val b = seg.select(col("seg_i"), col("seg_v"), col(idCol).as("id_b"), col(fplCol).as("_lb"))
    a.join(b, Seq("seg_i", "seg_v"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        bit_count(col("_la").bitwiseXOR(col("_lb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
