package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) hashing — the stable shard assigner
  * for re-shardable storage and routing at corpus scale. Each key goes to
  * the shard whose md5(shard ":" key) is lexicographically largest.
  *
  * The property that matters at 100 TB: growing n → n+1 shards moves a key
  * ONLY if the new shard wins its rendezvous — every move lands on the new
  * shard, ~1/(n+1) of keys move, and no key ever migrates between two old
  * shards (a modulo partitioner reshuffles ~all keys on any resize). The
  * q142 oracle's output shape pins this structurally: the (old, new)
  * transition matrix may contain only diagonal cells and the new-shard
  * column.
  *
  * md5-derived like every portable recipe in this library, so shard maps
  * are bit-identical in any engine and across time — a stored shard
  * assignment can be recomputed, never persisted-and-feared. Pure
  * stateless projection (an n-element array max), no shuffle, no UDF.
  */
object Rendezvous {

  /** Shard id in [0, n) for `key` — argmax over shards of md5(r ":" key).
    * Long-typed (matches the BIGINT the SQL replay produces). md5 outputs
    * are unique across the n candidates for any real key population, so
    * the argmax is total; the struct max breaks a (never-observed) hash
    * tie toward the higher shard id in both engines.
    */
  def shard(key: Column, n: Int): Column = {
    require(n > 0, s"n=$n shards must be positive")
    array_max(
      transform(sequence(lit(0L), lit(n - 1L)), r =>
        struct(md5(concat(r.cast("string"), lit(":"), key.cast("string"))).as("h"),
          r.as("r"))))
      .getField("r")
  }
}
