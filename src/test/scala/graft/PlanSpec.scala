package graft

/** Physical-plan assertions: the plans that would matter at 100 TB must
  * actually materialize — filters reaching the parquet scan, dimension
  * broadcast, map-side partial aggregation, column pruning. A regression
  * here is a silent 100× at scale even when results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q04: id-range predicate pushes down to the parquet scan") {
    val p = plan("q04_id_range_filter")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(o_orderkey,100"),
      s"missing pushdown in:\n$p")
  }

  test("q04: scan reads only the projected columns") {
    val p = plan("q04_id_range_filter")
    assert(p.contains("ReadSchema") && !p.contains("o_orderdate"), "column pruning regressed")
  }

  test("q24: dimension join broadcasts, no shuffle of the fact for the join") {
    val p = plan("q24_join_agg")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$p")
  }

  test("q23: aggregation is partial (map-side combine) before the exchange") {
    val p = plan("q23_agg_group")
    assert(p.contains("partial_"), s"expected partial aggregation in:\n$p")
  }

  test("q30: exact dedup aggregates partially before shuffling") {
    val p = plan("q30_dedup_exact")
    assert(p.contains("partial_"), s"expected partial aggregation in:\n$p")
  }

  test("q09: anti-join uses a hash join, not nested loop") {
    val p = plan("q09_dedup_cross")
    assert(p.contains("LeftAnti"), s"expected anti join in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), "anti join degenerated to nested loop")
  }

  test("q01: vectorized scan + whole-stage codegen cover the pipeline") {
    val df = SparkEntry.queries("q01_scan_rename")(spark, sf)
    df.collect() // AQE finalizes this plan only when THIS df executes (count() plans separately)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Batched: true"), s"scan not vectorized:\n$p")
    // codegen spans print as *(n) in executed-plan strings
    assert(p.contains("*("), s"expected codegen span in:\n$p")
  }

  test("q31: minhash aggregation is map-side combined (objHashAggregate/partial)") {
    val p = plan("q31_dedup_minhash_lsh")
    assert(p.contains("partial_min") || p.contains("ObjectHashAggregate"),
      s"expected partial min aggregation in:\n$p")
  }

  test("q52: range join plans as an equi-join, never a nested loop") {
    val p = plan("q52_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$p")
    assert(p.contains("Join"), s"no join in:\n$p")
  }

  test("q51: as-of join is a window over a union — no join of the two sides at all") {
    val p = plan("q51_asof_join")
    assert(p.contains("Window") && p.contains("Union"), s"expected union+window in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of degenerated to a nested loop:\n$p")
  }

  test("q49: salted aggregate is two stages, both map-side combined") {
    val p = plan("q49_salted_agg")
    assert(p.split("partial_").length >= 3, // at least two partial agg stages
      s"expected two-phase partial aggregation in:\n$p")
  }

  test("q66: per-key quota rank filter becomes a WindowGroupLimit (pre-shuffle top-n)") {
    val p = plan("q66_domain_quota")
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$p")
  }

  test("q67: decontamination is a broadcast semi-join — corpus side never shuffles") {
    val p = plan("q67_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected broadcast left-semi join in:\n$p")
  }

  test("q70: fuzzy join candidates come from equi-joins, never a cross product") {
    val p = plan("q70_fuzzy_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"fuzzy join degenerated to a cross product:\n$p")
    // the verify predicate runs the banded 3-arg levenshtein (threshold
    // prints as `Some(1)` in physical plan strings)
    assert(p.contains("levenshtein") && (p.contains("Some(1)") || p.contains(", 1)")),
      s"expected banded levenshtein in:\n$p")
  }

  test("q80: native as-of plans the custom exec with sorted, clustered children") {
    val df = SparkEntry.queries("q80_asof_native")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$p")
    assert(p.contains("Sort"), s"expected EnsureRequirements sorts in:\n$p")
  }

  test("q65: hash split plans with no exchange at all (stateless projection)") {
    val df = SparkEntry.queries("q65_hash_split")(spark, sf)
    // the split assignment itself is shuffle-free; only the final tiny
    // groupBy aggregates — assert the scan→project stage has no Exchange
    // before the aggregation's partial stage
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_"), s"expected partial aggregation in:\n$p")
    assert(p.split("Exchange").length <= 3, s"unexpected extra exchanges in:\n$p")
  }

  test("q101: bloom probe filters the big side BEFORE its exchange") {
    val p = plan("q101_bloom_semi")
    assert(p.contains("bloom_probe"), s"expected bloom probe in:\n$p")
    // the probe must sit below the first Exchange (scan-side), not above it
    val probeAt = p.indexOf("bloom_probe")
    val joinAt = p.indexOf("Join")
    assert(joinAt >= 0 && probeAt > joinAt,
      "bloom probe should appear in the plan's scan branch (printed below the join)")
  }

  test("q95/q98: global ranking plans with no Window and no single-partition exchange") {
    // a bare `ntile/percent_rank OVER (ORDER BY …)` would show up as a
    // Window over Exchange SinglePartition — the one-task global sort.
    // GlobalRank's formulation must keep both out of the whole plan.
    for (q <- Seq("q95_ntile", "q98_rank_ratios")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q regressed to a window plan:\n$p")
      assert(!p.contains("SinglePartition"), s"$q has a single-partition exchange:\n$p")
    }
  }

  test("q116: capped near-dup pair join is shuffle-hash, never a broadcast of the fan-out") {
    // sf0.001 embeddings max block (63) > cap (16), so the triangle path
    // plans here. AQE would happily broadcast the replicated side — a
    // driver-sized hash of the whole fan-out and a single-point build at
    // scale; the shuffle_hash hint must hold it to a key-partitioned join.
    val p = plan("q116_embed_capped")
    assert(p.contains("ShuffledHashJoin"), s"expected shuffle-hash pair join in:\n$p")
  }

  test("q115: banded LSH candidates come from an equi-join, never a cross product") {
    val p = plan("q115_ann_lsh_banded")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"banded LSH degraded to an all-pairs plan:\n$p")
    assert(p.contains("Generate"), s"missing band posexplode in:\n$p")
  }

  test("q124/q126: exact median & quantiles rank without a Window operator") {
    // the naive spelling is row_number() OVER (ORDER BY ...) — a Window over
    // a single-partition sort of EVERY row. The GlobalRank formulation must
    // keep Window out entirely. (q124's final 2-row global aggregate does
    // carry the usual partial-agg → SinglePartition merge — that exchange
    // moves 2 rows and is the sanctioned global-agg shape, not the
    // anti-pattern, so only the Window absence is asserted there.)
    for (q <- Seq("q124_exact_median", "q126_exact_quantiles")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q regressed to a window plan:\n$p")
    }
    // q126 has no global aggregate: no single-partition exchange at all
    val p126 = plan("q126_exact_quantiles")
    assert(!p126.contains("SinglePartition"), s"q126 has a single-partition exchange:\n$p126")
  }

  test("q118: quantized ANN is one scan + projections + TakeOrdered — no exchange at all") {
    val p = plan("q118_ann_quantized")
    assert(p.contains("TakeOrderedAndProject"), s"expected distributed top-k in:\n$p")
    assert(!p.contains("Exchange"), s"quantize/dequantize should be shuffle-free:\n$p")
  }

  test("q136: HLL register build aggregates partially (map-side combine) before the exchange") {
    // the whole point of the sketch: the per-occurrence stream combines to
    // <= 256 rows on the map side; shuffling raw occurrences would defeat it
    val p = plan("q136_hll_distinct")
    assert(p.contains("partial_max"), s"expected partial max register build in:\n$p")
  }

  test("q142: rendezvous shard assignment is a stateless projection + one partial agg") {
    // the md5 argmax must stay a projection (no join, no window, no extra
    // shuffle beyond the count's own partial-agg exchange)
    val p = plan("q142_rendezvous_shards")
    assert(!p.contains("Join"), s"rendezvous shard must not plan a join:\n$p")
    assert(!p.contains("Window"), s"rendezvous shard must not plan a window:\n$p")
    assert(p.contains("partial_count"), s"expected map-side combined count in:\n$p")
  }

  test("q137: prefix-join candidates come from equi-joins, never a cross product") {
    val p = plan("q137_prefix_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix join degenerated to a cross product:\n$p")
  }

  test("q145: inverted index blocks without a Window (no per-token row_number)") {
    // blocking must stay a projection: a rank-based block would drag a stop
    // word's full posting list into one window partition
    val p = plan("q145_inverted_index")
    assert(!p.contains("Window"), s"posting blocks must not come from a window:\n$p")
    assert(p.contains("partial_"), s"expected map-side combined tf counts in:\n$p")
  }

  test("q148: pagerank iterations are keyed equi-joins, no cross product, no window") {
    val p = plan("q148_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pagerank degenerated to a cross product:\n$p")
    assert(!p.contains("Window"), s"pagerank must not plan a window:\n$p")
  }

  test("q151: hard-negative top-1 is a partial max aggregate, not a corpus window") {
    val p = plan("q151_hard_negatives")
    assert(!p.contains("Window"), s"top-1 per anchor must not be a window:\n$p")
    assert(p.contains("partial_max"), s"expected map-side combined max in:\n$p")
  }

  test("q152: containment candidates come from equi-joins, never a cross product") {
    val p = plan("q152_containment_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"containment join degenerated to a cross product:\n$p")
  }

  test("q155: the sample sketch is a distributed TakeOrdered, not a global sort") {
    // assert on the sketch subplan: in the composed q155 plan it hides
    // behind GlobalRank's ExistingRDD lineage break
    import org.apache.spark.sql.functions._
    val li = graft.Tables.load(spark, sf, "lineitem")
    val p = graft.operators.SampleSketch
      .bottomK(li, concat_ws(":", col("l_orderkey"), col("l_linenumber")), 2000)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected distributed top-k sample in:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"sample must not global-sort:\n$p")
  }

  test("q156: sorted-neighborhood candidates come from equi-joins, no window, no cross product") {
    val p = plan("q156_sorted_neighborhood")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"rank-window candidates degenerated to a cross product:\n$p")
    assert(!p.contains("Window"), s"global rank must come from GlobalRank, not a Window:\n$p")
  }

  test("q164: weighted sample is a distributed TakeOrdered, never a global sort") {
    val p = plan("q164_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k pick in:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"sample must not global-sort:\n$p")
  }

  test("q168: tombstone audit broadcasts the deletion set — fact tables never shuffle") {
    val p = plan("q168_tombstone_purge")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast of tombstones in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact side must not shuffle for the join:\n$p")
  }

  test("q170: CDC apply is one partial max(struct) aggregate — no window, no join") {
    val p = plan("q170_cdc_apply")
    assert(p.contains("partial_max"), s"expected map-side combined max(struct) in:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"CDC fold must not need a window or a join:\n$p")
  }

  test("q163: EWMA is a single window stage over one exchange") {
    val p = plan("q163_ewma")
    assert(p.contains("Window"), s"expected a window in:\n$p")
    assert("Window".r.findAllIn(p).size == 1, s"the lag family must fuse into ONE window:\n$p")
    assert(!p.contains("Join"), s"no self-join for lags:\n$p")
  }

  test("q189: every RRF top-k is a pre-shuffle WindowGroupLimit, never a full window sort") {
    val p = plan("q189_rrf_fusion")
    assert(p.contains("WindowGroupLimit"), s"expected group-limit pushdown in:\n$p")
  }

  test("q190/q191: rank stamping comes from GlobalRank's RDD pass, offsets broadcast back") {
    for (q <- Seq("q190_exact_split", "q191_epoch_shuffle")) {
      val p = plan(q)
      assert(p.contains("Scan ExistingRDD"), s"$q: expected the two-pass rank stamp in:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q: offsets/cuts must broadcast in:\n$p")
      assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
        s"$q: no stage may collapse the facts to one partition:\n$p")
    }
  }

  test("q192: keyness token counts are map-side combined before their exchange") {
    val p = plan("q192_keyness")
    assert(p.contains("partial_count"), s"expected partial aggregation in:\n$p")
  }

  test("q193: eval metrics reduce BEFORE the class-level full-outer join") {
    val p = plan("q193_langid_eval")
    assert(p.contains("partial_"), s"expected map-side combined confusion counts in:\n$p")
    assert(p.contains("FullOuter"), s"expected a class-keyed full outer join in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"class join must stay an equi-join:\n$p")
  }

  test("q202: KS cumulative rides GlobalRank's RDD stamp — no Window, no fact-sized single partition") {
    val p = plan("q202_ks_stat")
    assert(!p.contains("Window"), s"KS regressed to an ORDER BY window plan:\n$p")
    assert(p.contains("Scan ExistingRDD"), s"expected the two-pass prefix stamp in:\n$p")
  }

  test("q203: LOO encoding is ONE keyed window — no self-join of the facts") {
    val p = plan("q203_loo_encode")
    assert(p.contains("Window"), s"expected the category window in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"LOO must not self-join the fact table:\n$p")
  }

  test("q205: association pairs come from a basket equi-join; support floor precedes the measure joins") {
    val p = plan("q205_assoc_rules")
    assert(!p.contains("CartesianProduct"), s"pair generation degraded to all-pairs:\n$p")
    // the n_ab >= 2 floor must sit on the aggregate output, before the
    // item-count joins — visible as a count filter over a final hash agg
    assert(p.contains("(n_ab") && p.contains(">= 2"), s"minPairCount floor missing:\n$p")
  }

  test("q211: rollup is ONE Expand pass, not a union of re-scans") {
    val p = plan("q211_rollup")
    assert(p.contains("Expand"), s"expected grouping-sets Expand in:\n$p")
    assert(!p.contains("Union"), s"rollup regressed to unioned re-aggregations:\n$p")
  }

  test("q213: transition matrix is one keyed window + map-combined pair counts") {
    val p = plan("q213_markov")
    assert(p.contains("Window"), s"expected the per-user lead window in:\n$p")
    assert(p.contains("partial_count"), s"pair counts must map-side combine:\n$p")
  }

  test("q281/q285: NDCG windows stay query/qrels-grain — no global window stage") {
    for (q <- Seq("q281_ndcg", "q285_ndcg_graded")) {
      val p = plan(q)
      // the only windows allowed are partitioned by anchor (the top-k list
      // rank in q281's input, the qrels ideal ordering in q285) — a global
      // window here would serialize the corpus through one task. q281's BM25
      // branch carries the sanctioned scalar-agg merge (avgdl: partial
      // sum/count → one-row SinglePartition final → broadcast), so each
      // SinglePartition exchange must be exactly that shape — its child line
      // a partial HashAggregate — never a Sort or Window feed.
      val lines = p.linesIterator.toVector
      for ((line, i) <- lines.zipWithIndex if line.contains("Exchange SinglePartition")) {
        val child = lines.drop(i + 1).find(_.exists(c => c.isLetter)).getOrElse("")
        assert(child.contains("HashAggregate") && child.contains("partial_"),
          s"$q: SinglePartition exchange not a scalar-agg merge (child: $child):\n$p")
      }
      assert(p.contains("BroadcastHashJoin"),
        s"$q: small sides (rel totals / qrels) must broadcast:\n$p")
    }
  }

  test("q287: interval-overlap join is a bucketed equi-join, never a cartesian") {
    // the naive range predicate has no equi-key — Catalyst would plan
    // BroadcastNestedLoop/CartesianProduct, |L|·|R| at any scale. The
    // bucket id must give it a hashable key.
    val p = plan("q287_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"interval join degraded to an all-pairs plan:\n$p")
    assert(p.contains("Generate"), s"missing bucket explode in:\n$p")
  }

  test("q286: substring-dup interval merge windows stay per-document") {
    // the merged-interval window is PARTITIONED BY doc id; a global window
    // would serialize every shingle hit through one task
    val p = plan("q286_dup_ngram_cov")
    assert(!p.contains("Exchange SinglePartition"),
      s"q286 must not collapse to one partition:\n$p")
  }

  test("q293: temporal CV chunking is GlobalRank's range exchange, no global window") {
    // an `ntile OVER (ORDER BY t)` would serialize the table through one
    // window task; the fold summary must plan off the range-exchange ntile
    val p = plan("q293_ts_cv_folds")
    assert(!p.contains("Window"), s"q293 regressed to a window plan:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"q293 has a single-partition exchange:\n$p")
  }

  test("q294: centroid outliers end in a TakeOrdered, centroid broadcast, no global sort") {
    val p = plan("q294_embed_outliers")
    assert(p.contains("TakeOrderedAndProject"), s"expected distributed top-k in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the one-row centroid must broadcast:\n$p")
  }

  test("q295: conformal order statistic plans without a per-group window") {
    // the k-th-smallest residual must come from the range-exchange rank,
    // not a Window.partitionBy(group) that pins each group to one task
    val p = plan("q295_conformal")
    assert(!p.contains("Window"), s"q295 regressed to a window plan:\n$p")
  }
}
