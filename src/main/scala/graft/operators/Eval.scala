package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier evaluation at corpus scale: per-class confusion counts and
  * precision/recall/F1 from a (truth, prediction) column pair — the
  * score-the-heuristic step a curation pipeline runs every time a filter
  * model (language ID, quality, toxicity) is revised against a labeled
  * slice.
  *
  * Determinism: every metric is ONE IEEE division of exact integer counts
  * (F1 via its rational identity 2·tp / (n_true + n_pred) — algebraically
  * 2PR/(P+R), but with no intermediate rounding), so results are
  * bit-identical across engines with no pinning needed. Undefined metrics
  * (zero denominator: a class never predicted / never true) are NULL, not
  * NaN — NaN is unorderable and engine-dependent in comparisons.
  *
  * Scale shape: two map-side-combined aggregates over the pair stream
  * (keyed by truth and by prediction), full-outer-joined on the class
  * label — |classes| rows after the first shuffle; no windows, no
  * collect.
  */
object Eval {

  /** Per-class metrics: (clazz, n_true, n_pred, tp, precision, recall,
    * f1). `clazz` ranges over labels appearing as truth OR prediction;
    * counts are 0 where a side never saw the class.
    */
  def perClassPrf(df: DataFrame, truthCol: String, predCol: String): DataFrame = {
    val byTruth = df.groupBy(col(truthCol).as("clazz"))
      .agg(
        count(lit(1)).as("n_true"),
        sum(when(col(predCol) === col(truthCol), 1L).otherwise(0L)).as("_tp_t"))
    val byPred = df.groupBy(col(predCol).as("clazz"))
      .agg(count(lit(1)).as("n_pred"))
    byTruth.join(byPred, Seq("clazz"), "full_outer")
      .select(
        col("clazz"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("_tp_t"), lit(0L)).as("tp"))
      .withColumn("precision",
        when(col("n_pred") > 0, col("tp").cast("double") / col("n_pred").cast("double")))
      .withColumn("recall",
        when(col("n_true") > 0, col("tp").cast("double") / col("n_true").cast("double")))
      .withColumn("f1",
        when(col("n_true") + col("n_pred") > 0,
          (lit(2L) * col("tp")).cast("double") /
            (col("n_true") + col("n_pred")).cast("double")))
  }

  /** Ranked-retrieval quality per query: hits, first relevant rank, MRR,
    * precision@k, and AP@k (MAP's per-query term) — the evaluation loop
    * that closes the index → rank → fuse retrieval family. NDCG lives in
    * [[ndcgAtK]] — its log2 discount needs the pinned-micro-nat ln
    * recipe, so it is a separate pinned-term aggregate rather than a
    * column here.
    *
    * Determinism: the reciprocal rank is the INTEGER quotient
    * 1000000 div rank; each AP term is (hits_at_i · 1000000) div i — all
    * integer division — summed as longs, and every emitted double is one
    * final division. Queries with no relevant document in the corpus get
    * NULL ap (0/0 is undefined, not zero); queries whose list has no
    * relevant hit get mrr 0 and NULL first_rel_rank.
    *
    * Scale shape: the relevance flag joins on (query, doc); the running
    * hit count is a window PARTITIONED BY query over the top-k list —
    * k rows per query, bounded by construction, never corpus-sized. One
    * aggregate keyed by query, then a broadcast join of per-query
    * relevant-total counts.
    *
    * @param ranked    (queryCol, idCol, rank) — per-query top-k, rank 1-based
    * @param relevant  (queryCol, idCol) — the qrels pairs
    * @param relTotals (queryCol, n_rel) — relevant docs per query IN THE
    *                  CORPUS (caps AP's denominator, so a query with fewer
    *                  than k relevant docs can still reach AP 1.0)
    */
  def rankingMetrics(
      ranked: DataFrame,
      relevant: DataFrame,
      relTotals: DataFrame,
      queryCol: String,
      idCol: String,
      pAtK: Int = 10,
      apAtK: Int = 20): DataFrame = {
    require(pAtK > 0 && apAtK > 0, s"pAtK=$pAtK and apAtK=$apAtK must be positive")
    val flagged = ranked
      .join(relevant.select(col(queryCol), col(idCol), lit(true).as("_rel")),
        Seq(queryCol, idCol), "left")
      .withColumn("_rel", coalesce(col("_rel"), lit(false)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(queryCol).orderBy("rank")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val scored = flagged
      .withColumn("_hits", sum(when(col("_rel"), 1L).otherwise(0L)).over(w))
      .withColumn("_ap_term",
        when(col("_rel") && col("rank") <= apAtK,
          expr("(_hits * 1000000L) div rank")).otherwise(0L))
    scored
      .groupBy(col(queryCol))
      .agg(
        sum(when(col("_rel"), 1L).otherwise(0L)).as("hits"),
        min(when(col("_rel"), col("rank"))).as("first_rel_rank"),
        sum(when(col("_rel") && col("rank") <= pAtK, 1L).otherwise(0L)).as("_p_hits"),
        sum(col("_ap_term")).as("_ap_sum"))
      .join(broadcast(relTotals.select(col(queryCol), col("n_rel"))), Seq(queryCol))
      .withColumn("mrr",
        coalesce(expr("1000000L div first_rel_rank"), lit(0L)).cast("double") / 1000000.0)
      .withColumn("p_at_k", col("_p_hits").cast("double") / pAtK.toDouble)
      .withColumn("ap",
        when(col("n_rel") > 0,
          col("_ap_sum").cast("double") /
            (least(col("n_rel"), lit(apAtK.toLong)) * 1000000L).cast("double")))
      .select(col(queryCol), col("n_rel"), col("hits"), col("first_rel_rank"),
        col("mrr"), col("p_at_k"), col("ap"))
  }

  /** Recall@k per query at several cutoffs in ONE pass — the coverage twin
    * of [[rankingMetrics]]' precision@k: of the `n_rel` relevant docs in
    * the corpus, how many made the top-k list. The retrieval-side number a
    * RAG pipeline actually gates on (a reranker can fix order, not
    * absence). Output: (queryCol, n_rel, then per cutoff `hits_at_<k>` and
    * `recall_at_<k>`), with recall = hits·1.0/n_rel as one final division;
    * queries with n_rel = 0 emit NULL recalls (undefined, not zero).
    *
    * Scale shape: one (query, doc) relevance join, one aggregate keyed by
    * query with a conditional sum per cutoff (no window at all — recall
    * needs no running count), then the broadcast n_rel join. Inputs as in
    * [[rankingMetrics]].
    */
  def recallAtK(
      ranked: DataFrame,
      relevant: DataFrame,
      relTotals: DataFrame,
      queryCol: String,
      idCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), s"ks=$ks must be non-empty positive cutoffs")
    require(ks.distinct == ks, s"ks=$ks must be distinct (duplicate output columns otherwise)")
    val flagged = ranked
      .join(relevant.select(col(queryCol), col(idCol), lit(true).as("_rel")),
        Seq(queryCol, idCol), "left")
      .withColumn("_rel", coalesce(col("_rel"), lit(false)))
    val hitCols = ks.map(k =>
      sum(when(col("_rel") && col("rank") <= k, 1L).otherwise(0L)).as(s"hits_at_$k"))
    val agg = flagged.groupBy(col(queryCol))
      .agg(hitCols.head, hitCols.tail: _*)
      .join(broadcast(relTotals.select(col(queryCol), col("n_rel"))), Seq(queryCol))
    ks.foldLeft(agg) { (df, k) =>
      df.withColumn(
        s"recall_at_$k",
        when(col("n_rel") > 0,
          col(s"hits_at_$k").cast("double") / col("n_rel").cast("double")))
    }.select(
      col(queryCol) +: col("n_rel") +:
        ks.flatMap(k => Seq(col(s"hits_at_$k"), col(s"recall_at_$k"))): _*)
  }

  /** NDCG@k per query (binary relevance) via the pinned-micro-nat ln
    * recipe (the q182/q226/q228 discipline): the rank discount
    * 1/log2(i+1) is derived from ONE natural log per list row, pinned
    * BEFORE any sum — u = floor(ln(rank+1)·10⁶ + 0.5) micro-nats, then
    * rmicro = (693147·10⁶) div u, with ln 2 itself pinned to the literal
    * 693147 micro-nats (so rank 1 is exactly 10⁶). DCG and IDCG are exact
    * long sums of rmicro terms; `ndcg` is their single final division.
    * IDCG@k sums the first min(k, n_rel) discounts off the SAME pinned
    * table, so numerator and denominator can never disagree on a ulp.
    * Queries with no relevant document (idcg 0) emit NULL ndcg —
    * undefined, not zero.
    *
    * Scale shape: identical to [[rankingMetrics]] — the relevance flag
    * joins on (query, doc) over the k-row-per-query list, one grouped
    * aggregate keyed by query, per-query totals broadcast. The discount
    * ln runs once per OUTPUT list row (≤ k per query), never per corpus
    * row.
    *
    * The ranked list must hold at least min(k, n_rel) rows per query
    * (true for any top-k retrieval over a corpus containing the relevant
    * docs) — IDCG is summed from list positions.
    */
  def ndcgAtK(
      ranked: DataFrame,
      relevant: DataFrame,
      relTotals: DataFrame,
      queryCol: String,
      idCol: String,
      k: Int = 10): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val flagged = ranked
      .filter(col("rank") <= k)
      .join(relevant.select(col(queryCol), col(idCol), lit(true).as("_rel")),
        Seq(queryCol, idCol), "left")
      .withColumn("_rel", coalesce(col("_rel"), lit(false)))
      .withColumn("_u", floor(log(col("rank").cast("double") + 1.0) * 1000000.0 + 0.5)
        .cast("long"))
      .withColumn("_rm", expr("693147000000 div _u"))
    flagged
      .join(broadcast(relTotals.select(col(queryCol), col("n_rel"))), Seq(queryCol))
      .groupBy(col(queryCol), col("n_rel"))
      .agg(
        sum(when(col("_rel"), col("_rm")).otherwise(0L)).as("dcg_micro"),
        sum(when(col("rank") <= least(lit(k.toLong), col("n_rel")), col("_rm"))
          .otherwise(0L)).as("idcg_micro"))
      .select(col(queryCol), col("n_rel"), col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") > 0,
          col("dcg_micro").cast("double") / col("idcg_micro").cast("double")).as("ndcg"))
  }

  /** Graded-relevance NDCG@k — the reranker-eval variant of [[ndcgAtK]]:
    * qrels carry an integer grade (0 = irrelevant … up to 30), gain =
    * 2^grade − 1 (exact long), and both DCG and IDCG are exact long sums
    * of gain·rmicro over the SAME pinned discount table ([[ndcgAtK]]'s
    * recipe). IDCG ranks each query's qrels by (grade desc, id asc) —
    * a window over the QRELS table, qrels-grain, never corpus-grain —
    * and charges the top min(k, |qrels|) grades the best discounts
    * (`n_ideal` = how many were charged). List documents absent from
    * qrels carry grade 0 (gain 0); a query needs at least one qrel ROW to
    * appear (the rankingMetrics inner-join contract). `ndcg` is one final
    * division; NULL when the query has no positive-grade qrel.
    */
  def ndcgGradedAtK(
      ranked: DataFrame,
      qrels: DataFrame,
      queryCol: String,
      idCol: String,
      gradeCol: String,
      k: Int = 10): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    // pinned discount of _pos: u micro-nats once per row, integer quotient
    def withTerm(df: DataFrame): DataFrame = df
      .withColumn("_u", floor(log(col("_pos").cast("double") + 1.0) * 1000000.0 + 0.5)
        .cast("long"))
      .withColumn("_term",
        expr("(shiftleft(1L, cast(_g as int)) - 1L) * (693147000000 div _u)"))
    val rel = qrels.select(
      col(queryCol), col(idCol),
      col(gradeCol).cast("long").as("_g"))
    val dcg = withTerm(ranked
      .filter(col("rank") <= k)
      .join(rel, Seq(queryCol, idCol), "left")
      .withColumn("_g", coalesce(col("_g"), lit(0L)))
      .withColumn("_pos", col("rank")))
      .groupBy(col(queryCol))
      .agg(sum(col("_term")).as("dcg_micro"))
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(queryCol).orderBy(col("_g").desc, col(idCol).asc)
    val idcg = withTerm(rel
      .withColumn("_pos", row_number().over(wIdeal).cast("long"))
      .filter(col("_pos") <= k))
      .groupBy(col(queryCol))
      .agg(sum(col("_term")).as("idcg_micro"), count(lit(1)).as("n_ideal"))
    dcg.join(idcg, Seq(queryCol))
      .select(col(queryCol), col("n_ideal"), col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") > 0,
          col("dcg_micro").cast("double") / col("idcg_micro").cast("double")).as("ndcg"))
  }

  /** Probability-calibration bins + per-bin Brier contribution: given a
    * bucketed score (`bucketCol` — any deterministic bucketing; deciles
    * via [[graft.operators.GlobalRank.ntile]] at scale), a predicted
    * probability in exact integer MICRO units (`pMicroCol` ∈ [0, 10⁶]) and
    * a binary label, returns per bucket:
    * (bucket, n, n_pos, mean_p_micro, frac_pos, brier_micro) where
    * `mean_p_micro = Σp div n` (exact), `frac_pos` is one IEEE division of
    * exact counts, and `brier_micro = Σ(p − 10⁶·y)² div (10⁶·n)` — the
    * bucket's mean squared error in micro units, exact integer end-to-end.
    * Reliability reads as mean_p_micro vs frac_pos per bucket; ECE/Brier
    * totals are weighted sums the caller takes over the bins.
    *
    * Scale shape: one map-side-combined grouped aggregate keyed by bucket;
    * |buckets| output rows. Scan-dominated.
    */
  def calibrationBins(
      df: DataFrame,
      bucketCol: String,
      pMicroCol: String,
      labelCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val p = col(pMicroCol).cast("long")
    val y1m = when(col(labelCol) =!= 0, 1000000L).otherwise(0L)
    df.groupBy(col(bucketCol).cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(labelCol) =!= 0, 1L).otherwise(0L)).as("n_pos"),
        sum(p.cast(dec)).as("_sp"),
        sum(((p - y1m) * (p - y1m)).cast(dec)).as("_sq"))
      .select(
        col("bucket"), col("n"), col("n_pos"),
        // `div`, not `/`: decimal `/` rounds at a derived scale before the
        // cast — integral divide is the exact floor both engines agree on
        expr("_sp div n").as("mean_p_micro"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("frac_pos"),
        expr("_sq div (cast(n as decimal(38,0)) * 1000000)").as("brier_micro"))
  }

  /** Cohen's κ between two categorical raters — chance-corrected
    * agreement, the statistic that separates "the two labelers agree 90%"
    * from "they'd agree 85% by luck" (rater audit for labeling pipelines;
    * also heuristic-vs-model filter comparison). Returns one row:
    * (n, n_agree, po, pe, kappa) with po = observed agreement and pe =
    * Σ_c margA(c)·margB(c)/n², both exact-count rationals; κ =
    * (po − pe)/(1 − pe) is the only compound double, pinned by the caller.
    *
    * Determinism: per-class marginals are exact longs, the pe numerator
    * Σ margA·margB is an exact decimal sum, and po/pe/κ are IEEE
    * operations on those exact integers — bit-identical across engines.
    * Scale shape: two map-side-combined aggregates (by rater-A class and
    * by rater-B class) + one agreement count, joined on the class label —
    * |classes| intermediate rows, then a single-row reduce.
    */
  def cohenKappa(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val dec = "decimal(38,0)"
    val margA = df.groupBy(col(raterA).as("clazz")).agg(count(lit(1)).as("_ma"))
    val margB = df.groupBy(col(raterB).as("clazz")).agg(count(lit(1)).as("_mb"))
    val peNum = margA.join(margB, Seq("clazz"))
      .agg(sum(col("_ma").cast(dec) * col("_mb").cast(dec)).as("_pe_num"))
    val agree = df.agg(
      count(lit(1)).as("n"),
      sum(when(col(raterA) === col(raterB), 1L).otherwise(0L)).as("n_agree"))
    agree.crossJoin(peNum)
      .select(
        col("n"), col("n_agree"),
        (col("n_agree").cast("double") / col("n").cast("double")).as("po"),
        (col("_pe_num").cast("double") /
          (col("n").cast("double") * col("n").cast("double"))).as("pe"))
      .withColumn("kappa",
        when(col("pe") < 1.0, (col("po") - col("pe")) / (lit(1.0) - col("pe"))))
  }
}
