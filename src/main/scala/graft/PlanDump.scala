package graft

/** Dev helper: regenerate PLANS.md — formatted physical plans of flagship
  * queries, the evidence that the shapes SCALING.md claims (pushdown,
  * broadcast, partial aggregation, WindowGroupLimit, custom exec) actually
  * materialize. `runMain graft.PlanDump [sfDir]`.
  */
object PlanDump {
  private val Flagship = Seq(
    "q04_id_range_filter" -> "predicate pushdown + column pruning at the scan",
    "q24_join_agg" -> "broadcast dimension join, partial aggregation",
    "q31_dedup_minhash_lsh" -> "explode → map-side-combined min agg → banded self-join",
    "q51_asof_join" -> "as-of via union + single keyed window (no join)",
    "q80_asof_native" -> "custom AsOfJoinExec with clustered+sorted children",
    "q66_domain_quota" -> "rank filter rewritten to WindowGroupLimit",
    "q67_decontaminate" -> "broadcast shingle semi-join (corpus never shuffles)",
    "q70_fuzzy_pairs" -> "pigeonhole segment equi-join + banded levenshtein verify",
    "q79_salted_join" -> "salted hot-key join (salt spreads the big side)",
    "q92_range_frame" -> "RANGE window frame over event time",
    "q95_ntile" -> "global ranking with NO Window / SinglePartition exchange (rank stamped behind the reused range shuffle)",
    "q101_bloom_semi" -> "bloom probe (might_contain) filtering the big side scan-side, before its exchange",
    "q116_embed_capped" -> "triangle sub-blocked near-dup: shuffle-hash pair join on (blk, ki, kj) — broadcast of the fan-out held off by hint",
    "q118_ann_quantized" -> "int8 dequantize + cosine as ONE codegen'd projection: scan → project → TakeOrdered, no shuffle",
    "q124_exact_median" -> "exact median via distributed row_number: range exchange + offsets, no Window, no SinglePartition",
    "q136_hll_distinct" -> "HLL: narrow projection → 256-row partial-agg sketch; estimate is one tiny aggregate (no per-occurrence shuffle beyond the register build)",
    "q137_prefix_jaccard" -> "prefix similarity join: canonical-set collapse → rarest-token prefix equi-join with size+positional PPJoin pruning → codegen merge-scan verify → output-sized member expansion",
    "q145_inverted_index" -> "posting blocks by doc-id range: projection-keyed (token, block) aggregate, NO per-token row_number window",
    "q148_pagerank" -> "power iteration: node-sized rank/degree broadcast into one edge scan per round; shuffle = map-combined contribution sum",
    "q151_hard_negatives" -> "anchor broadcast nested-loop over the corpus + partial max(struct) top-1 — no corpus-sized window partition",
    "q164_weighted_sample" -> "sequential Poisson πps sample: TakeOrderedAndProject on the hash-priority, no range exchange",
    "q168_tombstone_purge" -> "deletion cascade: broadcast tombstones into each fact scan, audit counts on the same pass",
    "q170_cdc_apply" -> "change-feed fold: partial max(struct(seq,op,payload)) per key — no window, no join",
    "q176_dq_rules" -> "R quality rules in ONE aggregate scan, stacked to the audit ledger",
    "q189_rrf_fusion" -> "hybrid RRF: every per-system and fused top-k a pre-shuffle WindowGroupLimit; integer rrf quotient sum keyed (query, doc)",
    "q190_exact_split" -> "exact stratified split: GlobalRank stamp behind the reused range shuffle, cuts/offsets broadcast — no single-partition exchange over facts",
    "q202_ks_stat" -> "KS statistic: distinct-score grain, GlobalRank two-pass cumulative (no ORDER BY window), integer argmax reduction",
    "q204_label_prop" -> "label propagation round: edges ⋈ labels keyed join, map-combined plurality count, min-of-struct argmax — |E|-bounded shuffles",
    "q205_assoc_rules" -> "association rules: basket equi-join pair space, minPairCount floor ON the aggregate before the measure joins",
    "q211_rollup" -> "grouping sets: ONE Expand pass over the scan — detail, per-status and grand totals without re-scans",
    "q216_roc_auc" -> "AUC at distinct-score grain: map-combined tie table + GlobalRank two-pass prefix sum — no global rank window anywhere",
    "q219_theil_sen" -> "Theil-Sen: pair self-join at bounded SERIES grain, slopes pinned by integer div, exact two-middle median per group",
    "q223_hits" -> "HITS rounds as |E|-bounded keyed aggregates (the PageRank shuffle shape), exact-integer scores",
    "q226_psi" -> "PSI: two map-combined bucket counts + broadcast totals — drift readout in one fact pass",
    "q263_dsir_weights" -> "DSIR: dims-row bucket ratio table broadcast into the token stream — corpus never shuffles for the model, only the per-doc sum",
    "q267_skipping_depth" -> "zone-map audit: GlobalRank range-exchange ntile (no SinglePartition window), chunk-grain zone maps, broadcast overlap self-join",
    "q286_dup_ngram_cov" -> "substring dup coverage: zip-of-slices shingles (no join), map-combined frequency filter, doc-PARTITIONED interval-merge window",
    "q287_interval_join" -> "interval overlap as a bucketed equi-join: bucket explode → hash join → exact predicate re-check — no CartesianProduct/BroadcastNestedLoop",
    "q290_hist_quantiles" -> "histogram sketch: map-combined bin counts (one fact pass), cumulative window over the BOUNDED bin table only",
    "q298_png_features" -> "PNG decode (inflate + unfilter) per row inside mapPartitions: scan → batch decode → exact-integer feature projection, no shuffle before the final sort",
    "q299_crossformat3_dedup" -> "three-container dedup: per-format decode branches union into ONE dHash groupBy — format-blind fingerprint space, map-combined counts",
    "q300_jpeg_gray_features" -> "JPEG entropy decode + fixed-point IDCT per row inside mapPartitions (Huffman state never leaves the task): scan → batch decode → exact-integer feature projection, no shuffle before the final sort",
    "q305_gif_scene_changes" -> "temporal scene detection: multi-frame decode once per payload, then a per-media lag window over the FRAMES-grain table — pixels never shuffle, only channel sums",
    "q308_avi_frame_features" -> "REAL video container: RIFF/AVI walk + per-frame JPEG entropy decode inside mapPartitions — decode-independent MJPEG frames keep the whole path task-local, no shuffle before the final sort",
    "q311_jpeg_prog_features" -> "progressive JPEG: 6-scan SOF2 coefficient accumulation + render at EOI, still one mapPartitions batch per row — multi-scan decode state never leaves the task",
    "q313_incremental_canonical" -> "incremental dedup loop: ONE signature pass feeds five daily probes of the accumulated band index ((band,bucket)-keyed joins), then star-alternation components + canonical anti-join",
    "q314_adpcm_features" -> "IMA ADPCM decode: sequential predictor state machine per payload inside mapPartitions — parallel across payloads, zero shuffle before the final sort",
    "q318_flac_features" -> "FLAC decode: Rice/predictor entropy state per payload inside mapPartitions — lossless, parallel across payloads, zero shuffle before the final sort",
    "q319_bpe_encode" -> "BPE encode: Heaps'-law training state collapses to a per-word count BROADCAST onto the token stream — the corpus-sized explode never shuffles, one per-doc partial aggregate",
    "q321_vad_segments" -> "VAD islands: active-frame filter BEFORE the media-partitioned window (silence never shuffles), islands group-by, start-ordered numbering on the segment grain",
    "q322_png_interlaced" -> "Adam7 PNG: seven-pass inflate + unfilter + scatter per payload inside mapPartitions — interlace is task-local reassembly, zero shuffle before the final sort",
    "q332_ann_ivfpq" -> "IVF+PQ composite: nProbe cell prune BEFORE the code scan, per-cell relocated LUTs as codegen literal arrays, one scan + TakeOrdered — no joins, no raw-vector reads",
    "q334_warc_inventory" -> "WARC intake: per-archive gzip member walk + record framing inside mapPartitions (one parser per partition), zero shuffle before the final sort",
    "q335_warc_text" -> "WARC → clean text: container parse + HTTP route + extraction chain ALL stateless per row — the whole crawl intake is one codegen'd projection pipeline, no shuffle",
    "q336_robots" -> "robots.txt admission: window group-numbering on the tiny rules table, rules BROADCAST to the URL table, one window over matched pairs picks longest-match — two shuffles for a billion URLs",
    "q338_webdataset" -> "WebDataset shards: pack = one keyed shuffle to shard grain; parse + stem grouping explode samples inside mapPartitions — shard-per-row parallelism",
    "q339_main_content" -> "main-content extraction: block explode + density scoring stateless, ONE window (heading bridge) + ONE grouped aggregate back to doc grain — blocks never leave their doc's partition",
    "q343_warc_encodings" -> "WARC entity decoding: dechunk + gunzip inside the same per-archive mapPartitions pass as the container parse — wire decoding never adds a stage, no shuffle before the final sort",
    "q345_subtitle_cues" -> "subtitle cues: block explode + regexp timestamp algebra stateless, ONE window for cue order — cues never leave their file's partition",
    "q346_warc_charset" -> "charset-routed WARC→text: BOM/header/meta/trial routing runs inside the same per-archive mapPartitions pass as the container parse — charset handling never adds a stage",
    "q348_asr_align" -> "subtitle↔audio alignment: both span tables explode to (media, bucket) keys, ONE equi-join + later-start dedup filter, best cue via ONE partial-aggregated max(struct) — two keyed shuffles at any corpus size, no window, no distinct",
    "q349_cdx_index" -> "CDX capture index: gzip member walk + record parse + digest per archive inside mapPartitions; SURT/timestamp are stateless column algebra on top — zero shuffle before the final sort",
    "q350_cdx_revisit_resolve" -> "revisit resolution: originals pre-reduced to one row per digest (partial-agg min-struct), then ONE broadcastable digest equi-join — the revisit stream never shuffles twice",
    "q355_mp3_decode" -> "MP3 Layer III decode: side info + reservoir + Huffman + requantization all inside one decoder-per-partition mapPartitions pass, integer features ride the same scan — zero shuffle before the final sort",
    "q356_seq_pack" -> "sequence packing: GlobalRank's two-pass running total (ONE range exchange, no Window), piece emission a stateless explode on top — the whole packer is one shuffle",
    "q360_token_budget" -> "token-budget selection: global running total + rank behind one reused range shuffle, per-domain offsets BROADCAST — no per-domain window partition anywhere in the plan",
    "q365_loss_mask" -> "loss-mask spans: the mask rides THROUGH the pack as a carried label (no doc-table re-join), the pad span from a ONE-ROW total aggregate unioned in — no extra pass over pieces",
    "q372_mixture_anneal" -> "annealed interleave: phase-1 position AND token cumulative stamped behind ONE fused range exchange; the phase-2 remainder re-enters a fresh WFQ; phase offset a 1-row broadcast",
    "q374_pack_whole_docs" -> "whole-doc harmonic packing: ONE global rank over (class, id) minus a BROADCAST #classes offset table, bin identity pure quotient arithmetic — no per-class window, no sequential state",
    "q377_schedule_pack" -> "schedule-through-piece-store: each batch's WFQ interleave (two range stamps) feeds ONE packChunks range exchange at the recorded tail; the position-epoch fence is pure arithmetic — no coordination shuffle, and the store's monotonicity guard is two 1-row aggregates and a broadcast cross",
    "q378_multimodal_capstone" -> "multimodal capstone: revisit resolution = ONE broadcastable digest equi-join; shard roundtrip groups by shard_id; dedup = groupBy + equi-join on the content hash; budget/mixture/pack are the fused range stamps; the (position, doc) STRUCT key and the modality+mask struct label ride the pack — no join back from spans to segments")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.get("graft-plandump")
    val sb = new StringBuilder
    sb.append("# PLANS — flagship physical plans (generated by `graft.PlanDump`, sf0.01)\n\n")
    sb.append("Regenerate: `sbt \"runMain graft.PlanDump\" > /dev/null` writes PLANS.md.\n")
    for ((name, why) <- Flagship) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE so the printed plan is the executed one
      sb.append(s"\n## $name — $why\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(4000))
      sb.append("\n```\n")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/PLANS.md"),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[plandump] wrote PLANS.md (${Flagship.size} plans)")
    spark.stop()
  }
}
