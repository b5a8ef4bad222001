package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the data-LAYOUT lever for
  * multi-dimensional scans: interleaving the bits of two sort dimensions
  * gives one key whose total order keeps BOTH dimensions locally clustered,
  * so `repartitionByRange(zkey) + sortWithinPartitions(zkey)` before a
  * parquet write (e.g. [[graft.load.Snapshot.appendBatchClustered]] with the
  * key column) produces row groups whose min/max statistics are tight on
  * both columns at once — a filter on EITHER dimension prunes row groups,
  * where a plain lexicographic sort only serves its leading column.
  *
  * The key is a pure bit-arithmetic projection (shift/and/or — exact
  * integers, engine-portable), computed per row with no shuffle of its own.
  */
object ZOrder {

  /** 32-bit Morton key from the LOW 16 bits of each of two non-negative
    * dimension columns (callers bucket/clamp wider domains first — e.g.
    * `pmod(col, lit(1 << 16))` or a range-rank). Bit i of x lands at 2i,
    * bit i of y at 2i+1; the terms occupy disjoint bits so their sum IS the
    * bitwise OR.
    */
  def mortonKey16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
}
