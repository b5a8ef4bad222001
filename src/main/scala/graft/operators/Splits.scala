package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and epoch ordering — the two assignment
  * problems every training pipeline solves before a single batch is read:
  * which rows belong to train/val/test (EXACTLY sized, per stratum), and in
  * what order a sharded data loader visits the training rows.
  *
  * Both operators key every decision off `md5(seed || '|' || id)`, so the
  * assignment is a pure function of (seed, id): reproducible across runs,
  * engines, cluster layouts, and row arrival order — the property
  * `rand(seed)` does NOT give on a cluster, where the draw depends on
  * partition layout (cf. the hash-split discussion in the q65 gate).
  *
  * Scale stance: no single-partition windows anywhere. Global/per-stratum
  * positions come from [[GlobalRank.withRowNumber]] (range repartition +
  * two-pass offset stamping); per-stratum and per-shard offsets are
  * O(|strata|)/O(|shards|)-row aggregates broadcast back; split sizes come
  * from [[Allocation.largestRemainderBy]] over a strata×splits target table.
  */
object Splits {

  /** Exact stratified split: every stratum's rows are divided across the
    * named splits so each split's PER-STRATUM count is the largest-remainder
    * apportionment of the stratum size by `weights` — e.g. 8/1/1 yields
    * 80/10/10 percent, exact to the row, in every stratum (a Bernoulli
    * hash-split only hits the proportions in expectation; eval sets and
    * quota contracts need them exact). Rows are assigned in
    * `md5(seed|id)` order, so membership is stable under re-runs and
    * unrelated inserts elsewhere in the table.
    *
    * `idCol` must be UNIQUE — it is the hash input and the rank tie-break,
    * and GlobalRank's failOnTies turns a duplicated id into a loud error
    * rather than a silent misassignment.
    *
    * @param weights (splitName, weight) in cut order — the order determines
    *                which hash range lands in which split
    * @return input columns + `split`
    */
  def exactStratifiedSplit(
      df: DataFrame,
      idCol: String,
      stratumCols: Seq[String],
      weights: Seq[(String, Long)],
      seed: String): DataFrame = {
    require(stratumCols.nonEmpty, "need at least one stratum column")
    require(weights.nonEmpty, "need at least one split")
    require(weights.map(_._1).distinct.size == weights.size, "split names must be unique")
    Seq("_h", "_rn", "_n", "_minrn", "_r", "_stot", "_sw", "_ord", "_sp", "_lo", "_hi", "split")
      .foreach(c => require(!df.columns.contains(c),
        s"input column '$c' collides with an internal name (Splits.exactStratifiedSplit)"))
    require(!df.columns.exists(c => c.startsWith("_mk_") || c.startsWith("_ck_")),
      "input must not contain reserved '_mk_*'/'_ck_*' columns")
    val sk = stratumCols.map(col)
    val counts = df.groupBy(sk: _*).agg(count(lit(1)).as("_stot"))
    val splitArr = array(weights.zipWithIndex.map { case ((name, wgt), i) =>
      struct(lit(name).as("name"), lit(wgt).as("w"), lit(i).as("ord"))
    }: _*)
    val targets = counts
      .select(sk :+ col("_stot") :+ explode(splitArr).as("_sp"): _*)
      .select(sk ++ Seq(col("_stot"), col("_sp.name").as("split"),
        col("_sp.w").as("_sw"), col("_sp.ord").as("_ord")): _*)
    val alloc = Allocation.largestRemainderBy(
      targets, stratumCols, "_sw", "_stot", tieCols = Seq("split"))
    // cut points in declared split order: split i takes ranks (_lo, _hi]
    val wCut = org.apache.spark.sql.expressions.Window
      .partitionBy(sk: _*).orderBy(col("_ord"))
    val cuts = alloc
      .withColumn("_hi", sum(col("alloc")).over(wCut))
      .withColumn("_lo", col("_hi") - col("alloc"))
      .select(sk ++ Seq(col("split"), col("_lo"), col("_hi")): _*)
    // per-stratum dense rank in hash order: global two-pass row_number over
    // (stratum, hash, id), re-based by the stratum's minimum
    val hashed = df.withColumn("_h",
      md5(concat(lit(seed), lit("|"), col(idCol).cast("string"))))
    val stamped = GlobalRank.withRowNumber(
      hashed, stratumCols ++ Seq("_h", idCol), failOnTies = true)
    // join back with null-safe (<=>) keys: groupBy treats a NULL stratum
    // as a regular key value, so NULL-stratum rows form their own stratum
    // and must be SPLIT like any other — plain equality would silently
    // drop them from the output, breaking the every-row-lands-in-exactly-
    // one-split contract (the kAnonymize null-QI fix, same class)
    val minRn = stamped.groupBy(sk: _*).agg(min(col("_rn")).as("_minrn"))
      .select(stratumCols.map(c => col(c).as("_mk_" + c)) :+ col("_minrn"): _*)
    val ranked = stamped
      .join(broadcast(minRn),
        stratumCols.map(c => col(c) <=> col("_mk_" + c)).reduce(_ && _))
      .withColumn("_r", col("_rn") - col("_minrn") + 1L)
    val cutsK = cuts.select(
      stratumCols.map(c => col(c).as("_ck_" + c)) ++
        Seq(col("split"), col("_lo"), col("_hi")): _*)
    ranked
      .join(broadcast(cutsK),
        stratumCols.map(c => col(c) <=> col("_ck_" + c)).reduce(_ && _))
      .filter(col("_r") > col("_lo") && col("_r") <= col("_hi"))
      .drop("_h", "_rn", "_n", "_minrn", "_r", "_lo", "_hi")
      .drop(stratumCols.map("_mk_" + _): _*)
      .drop(stratumCols.map("_ck_" + _): _*)
  }

  /** Deterministic epoch shuffle + sharding for a multi-worker data loader:
    * each row gets a shard (`md5` prefix mod `numShards` — which worker
    * reads it), a 0-based position within its shard (hash order — the
    * worker's read order), and an interleaved `global_pos`
    * (`pos · numShards + shard`) that reconstructs the round-robin order
    * the worker pool realizes collectively. `global_pos` is unique
    * (pos, shard) arithmetic but NOT contiguous — shards differ in size,
    * so trailing positions of exhausted shards leave gaps; it is an ORDER
    * key, not an index.
    *
    * The shard comes from a different hash segment (hex digits 1-2) than
    * the intra-shard order (the full digest), so shard membership and
    * read order are decorrelated. A new seed = a new epoch permutation,
    * with zero state carried between epochs. `idCol` must be UNIQUE (same
    * failOnTies contract as [[exactStratifiedSplit]]).
    *
    * @return input columns + (`shard` int, `pos` long, `global_pos` long)
    */
  def epochShuffle(
      df: DataFrame,
      idCol: String,
      seed: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards=$numShards must be positive")
    Seq("_h", "_rn", "_n", "_minrn", "shard", "pos", "global_pos")
      .foreach(c => require(!df.columns.contains(c),
        s"input column '$c' collides with an internal name (Splits.epochShuffle)"))
    val hashed = df
      .withColumn("_h", md5(concat(lit(seed), lit("|"), col(idCol).cast("string"))))
      .withColumn("shard",
        (conv(substring(col("_h"), 1, 2), 16, 10).cast("int") % numShards).cast("int"))
    val stamped = GlobalRank.withRowNumber(
      hashed, Seq("shard", "_h", idCol), failOnTies = true)
    val minRn = stamped.groupBy(col("shard")).agg(min(col("_rn")).as("_minrn"))
    stamped
      .join(broadcast(minRn), Seq("shard"))
      .withColumn("pos", col("_rn") - col("_minrn"))
      .withColumn("global_pos", col("pos") * numShards + col("shard"))
      .drop("_h", "_rn", "_n", "_minrn")
  }

  /** Expanding-window time-series cross-validation folds — the temporal
    * split a forecasting / drift-sensitive model needs where the hash
    * splits above would leak the future into training: the table is cut
    * into `k + 1` equal-count temporal chunks ([[GlobalRank.ntile]] —
    * range repartition, never a single-partition window), and fold `f`
    * trains on chunks `1..f` and tests on chunk `f + 1` ("rolling-origin
    * evaluation"). Returns the k-row fold summary:
    *
    *   (fold, n_train, train_end, n_test, test_start, test_end,
    *    n_boundary_ties)
    *
    * where `train_end`/`test_start` are the first order column's bounds on
    * either side of the cut and `n_boundary_ties` counts test rows whose
    * time equals `train_end` — rows the equal-count cut placed in test but
    * that are temporally INDISTINGUISHABLE from the last training instant
    * (the leakage a caller must drop or re-fence; with a total order and
    * distinct timestamps it is 0). Fold membership for the actual training
    * run is the chunk stamp itself: train(f) = `chunk <= f`, test(f) =
    * `chunk == f + 1` on [[GlobalRank.ntile]]'s output with the same
    * arguments.
    *
    * `orderCols.head` is the event-time axis; append tie-break columns to
    * make the order total (ntile splits equal keys deterministically only
    * under a total order — same contract as [[exactStratifiedSplit]]).
    *
    * Scale shape: one range-exchange ntile pass; the per-chunk rollup is
    * k+1 rows; folds expand against that rollup, never against the data;
    * the tie count is one broadcast-join pass over the stamped rows.
    */
  def timeSeriesFolds(
      df: DataFrame,
      orderCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k folds must be >= 1")
    require(orderCols.nonEmpty, "timeSeriesFolds needs an order column")
    val t = col(orderCols.head)
    val chunked = GlobalRank.ntile(df, orderCols, k + 1, outCol = "_chunk")
    val perChunk = chunked.groupBy(col("_chunk"))
      .agg(
        count(lit(1)).as("_cn"),
        min(t).as("_cmin"),
        max(t).as("_cmax"))
    // k+1-row rollup: fold expansion is arithmetic over it, not over rows
    val spark = df.sparkSession
    val folds = spark.range(1, k + 1L).select(col("id").as("fold"))
    val train = folds
      .join(broadcast(perChunk), col("_chunk") <= col("fold"))
      .groupBy("fold")
      .agg(sum("_cn").as("n_train"), max("_cmax").as("train_end"))
    val test = folds
      .join(broadcast(perChunk), col("_chunk") === col("fold") + 1)
      .select(
        col("fold"), col("_cn").as("n_test"),
        col("_cmin").as("test_start"), col("_cmax").as("test_end"))
    // one pass over the stamped rows against the k-row boundary table: a
    // test row tied to train_end is a leak candidate the cut can't see
    val ties = chunked
      .join(
        broadcast(train.select(col("fold"), col("train_end"))),
        col("_chunk") === col("fold") + 1 && t === col("train_end"))
      .groupBy("fold")
      .agg(count(lit(1)).as("_nt"))
    train
      .join(test, Seq("fold"))
      .join(ties, Seq("fold"), "left")
      .select(
        col("fold"), col("n_train"), col("train_end"),
        col("n_test"), col("test_start"), col("test_end"),
        coalesce(col("_nt"), lit(0L)).as("n_boundary_ties"))
  }
}
