package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and per-key quota capping — the
  * reproducibility primitives of a training-data pipeline. `randomSplit` is
  * seed- and partitioning-dependent; these are pure functions of the row
  * key, so the same row lands in the same split on any cluster, any
  * partitioning, any engine (md5-derived, like every other portable hash in
  * this library — see [[graft.dedup.SimHash]]).
  *
  * Scale shape: split assignment is a stateless per-row projection (no
  * shuffle at all); quota capping is one shuffle on the key — and Spark 4's
  * `WindowGroupLimit` pushes the rank filter into a per-partition top-k
  * before the exchange, so the shuffle carries at most `n` rows per key per
  * input partition, not the whole table.
  */
object Splits {

  /** 24-bit integer from the md5 of the key's string form (first 6 hex
    * chars) — THE shared hash behind every split/sample recipe here; the
    * cross-engine oracles reproduce exactly this arithmetic, so all recipes
    * must draw from the same definition.
    */
  private def hash24(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 6), 16, 10).cast("long")

  /** Stable bucket in [0, n) from the key's 24-bit md5 hash. */
  def hashBucket(key: Column, n: Int): Column =
    hash24(key) % n

  /** Named split from integer weights, e.g. `Seq("train" -> 8, "val" -> 1,
    * "test" -> 1)` → 80/10/10. Buckets are cumulative ranges over the weight
    * sum.
    */
  def assignSplit(key: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val b = hashBucket(key, total)
    val cuts = weights.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    weights.zip(cuts).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), upper), rest) => when(b < upper, lit(name)).otherwise(rest)
    }
  }

  /** Deterministic ~`num`/`den` sample: keeps rows whose hash bucket falls
    * below the cut. Same row always kept or dropped, regardless of engine.
    */
  def hashSample(df: DataFrame, key: Column, num: Int, den: Int): DataFrame =
    df.filter(hashBucket(key, den) < num)

  /** Deterministic EXACTLY-n uniform-ish sample: order by the md5 of the key
    * and take n. "Sample exactly n rows from 100 TB" is a distributed TopK
    * by a pseudo-random sort key — per-partition top-n then a driver-side
    * merge of n·partitions candidates, never a global sort; the md5 key
    * makes the choice engine-portable and rerun-stable (`hashSample` gives
    * a FRACTION; this gives a COUNT).
    */
  def fixedSample(df: DataFrame, key: Column, n: Int): DataFrame =
    df.orderBy(md5(key.cast("string")), key).limit(n)

  /** Deterministic weighted sample of EXACTLY n rows, inclusion probability
    * ~proportional to `weight` — sequential Poisson sampling (Ohlsson 1998,
    * the πps design production statistics offices use): each row gets
    * priority ξ = u/w with u its key's 24-bit md5 uniform, and the n
    * SMALLEST priorities win. Heavier rows draw smaller ξ, so a document
    * 10× longer is ~10× likelier in-sample — the "sample tokens, not
    * documents" knob of corpus curation.
    *
    * Engine-portable by construction: u is an exact dyadic rational
    * (24-bit int / 2^24) and w an exact integer-valued double, so ξ is ONE
    * correctly-rounded IEEE division both engines perform on identical
    * operands — no RNG, no libm (`-ln(u)/w` exponential keys would hit
    * cross-engine `ln` last-ulp skew). Ties (same ξ) break by key.
    *
    * Scale shape: same distributed TopK as [[fixedSample]] — per-partition
    * top-n then an n·partitions merge, never a global sort.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column, n: Int): DataFrame = {
    require(n > 0, s"n=$n must be positive")
    val xi = (hash24(key).cast("double") / lit(16777216.0)) / weight.cast("double")
    df.filter(weight > 0).orderBy(xi, key).limit(n)
  }

  /** Deterministic stratified Bernoulli sample — the REBALANCING knob of
    * corpus curation (downsample the over-represented language/source, keep
    * the rare stratum whole): keep a row iff its key's 24-bit md5 uniform
    * `< rate(stratum)`; strata absent from `rates` use `defaultRate`. Pure
    * stateless projection (no shuffle, no state, no seed coordination);
    * rates that are binary fractions (0.5, 0.25, …) make the keep decision
    * bit-identical on any engine. A NULL key cannot be hashed: those rows
    * get uniform 0.0 — kept by ANY positive rate, dropped only by rate 0 —
    * rather than vanishing silently through a null comparison.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      key: Column,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "sampling rates must be within [0, 1]")
    val u = when(key.isNull, lit(0.0))
      .otherwise(hash24(key).cast("double") / lit(16777216.0))
    val rate = rates.foldLeft(lit(defaultRate): Column) {
      case (rest, (s, r)) => when(col(strataCol) === s, lit(r)).otherwise(rest)
    }
    df.filter(u < rate)
  }

  /** Temperature-flattened stratum rebalancing — the data-mixing knob of
    * LLM corpus assembly (downweight the dominant language/source toward a
    * flatter mix, keep rare strata whole): target share ∝ n_s^alpha, scaled
    * so the SMALLEST stratum keeps everything, i.e. keep_frac(s) =
    * (n_min / n_s)^(1−alpha). alpha = 1 keeps the natural mix; alpha = 0
    * downsamples every stratum to the smallest one's size (in expectation).
    * The keep decision hashes the row key ([[hashBucket]] family), so it is
    * per-row deterministic, partitioning-independent, and rerun-stable.
    * Double `pow` is NOT bit-portable across engines — for the oracle-gated
    * α = ½ case use [[temperatureRebalanceSqrt]], whose decision is exact
    * integer arithmetic. Rows with a NULL stratum are dropped (a NULL can't
    * key the count join under SQL equality) — normalize null strata to a
    * sentinel upstream if they must participate.
    */
  def temperatureRebalance(
      df: DataFrame,
      strataCol: String,
      key: Column,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha=$alpha must be in [0, 1]")
    require(!df.columns.contains("_ns") && !df.columns.contains("_nmin"),
      "temperatureRebalance: input already has a _ns/_nmin column")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_ns"))
    val nmin = counts.agg(min(col("_ns")).as("_nmin"))
    val u = hash24(key).cast("double") / lit(16777216.0)
    df.join(broadcast(counts), Seq(strataCol))
      .crossJoin(broadcast(nmin))
      .filter(u < pow(col("_nmin").cast("double") / col("_ns"), lit(1.0 - alpha)))
      .drop("_ns", "_nmin")
  }

  /** [[temperatureRebalance]] at α = ½ with an EXACT integer keep decision:
    * u < √(n_min/n_s)  ⟺  u²·n_s < n_min  ⟺  h²·n_s < n_min·2²⁴ for the
    * 12-bit hash h = u·2¹². Every quantity is integral, so the decision is
    * bit-identical in any engine with md5 — no floating-point pow/sqrt at
    * all. The 12-bit hash quantizes keep rates to 1/4096 granularity, and
    * h² < 2²⁴ keeps h²·n_s inside int64 for strata up to ~5·10¹¹ rows.
    */
  def temperatureRebalanceSqrt(df: DataFrame, strataCol: String, key: Column): DataFrame = {
    // NULL strata cannot key the count join (SQL equality) and would drop
    // silently — make the contract explicit, like GlobalRank's guards
    require(!df.columns.contains("_h") && !df.columns.contains("_ns") &&
      !df.columns.contains("_nmin"),
      "temperatureRebalanceSqrt: input already has a _h/_ns/_nmin column")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_ns"))
    val nmin = counts.agg(min(col("_ns")).as("_nmin"))
    val h12 = conv(substring(md5(key.cast("string")), 1, 3), 16, 10).cast("long")
    df.withColumn("_h", h12)
      .join(broadcast(counts), Seq(strataCol))
      .crossJoin(broadcast(nmin))
      .filter(col("_h") * col("_h") * col("_ns") < col("_nmin") * lit(16777216L))
      .drop("_h", "_ns", "_nmin")
  }

  /** Per-key quota: keep the top `n` rows of each key by `order` (include a
    * unique tie-break in `order` for determinism). The curation use: cap any
    * one domain/source at `n` documents, best-first.
    */
  def quotaPerKey(df: DataFrame, keyCol: String, order: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= n)
      .drop("_rk")
  }

  /** GROUP k-fold assignment: every row of a group lands in the SAME fold
    * (fold = the group key's 24-bit md5 hash mod k), so cross-validation
    * folds can't leak near-duplicate rows of one entity across the
    * train/test boundary — the grouped analogue of [[assignSplit]], and
    * the standard defense when rows cluster (all docs of a domain, all
    * lineitems of a supplier, all turns of a conversation).
    *
    * A pure projection — no shuffle, no state, stable under re-partition
    * and re-run on any engine with md5. Returns `df` plus a `fold` column
    * in [0, k).
    */
  def groupKFold(df: DataFrame, groupKey: Column, k: Int): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2")
    df.withColumn("fold", hashBucket(groupKey, k))
  }
}
