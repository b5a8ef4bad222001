package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixture-weighted corpus INTERLEAVE — the domain-mixing schedule a
  * pretraining run consumes: sources (domains, languages, crawls) with
  * target weights w_s emit documents into ONE deterministic global
  * order in which every prefix carries each source at its target
  * proportion within ±1 document (so the model sees the intended
  * mixture from step one, not after a full epoch).
  *
  * Discipline: weighted fair queuing by virtual finish time — the r-th
  * document of source s (1-based, in the caller's order) is keyed
  * v = r · (L / w_s) with L = lcm(weights), and the schedule is the
  * total order (v, source). Exact integer arithmetic (L/w_s divides
  * exactly), engine-replayable, and the classic WFQ bound gives the
  * ±1-per-source prefix property.
  *
  * Scale shape: per-source ranks come from ONE global
  * [[GlobalRank.withRowNumber]] stamp over (source, order) MINUS each
  * source's broadcast offset (a #sources-row aggregate) — never a
  * per-source window partition, which would collapse each source to a
  * single task. The final position stamp is a second two-pass rank on
  * (v, source). Two range shuffles total at any corpus size.
  */
object Mixture {

  private def lcm(a: Long, b: Long): Long = {
    @annotation.tailrec
    def gcd(x: Long, y: Long): Long = if (y == 0) x else gcd(y, x % y)
    a / gcd(a, b) * b
  }

  /** Schedule `df`'s rows: one row per input with `position` (0-based
    * global order), `src_rank` (1-based within source), and the integer
    * `vtime` key. `orderCol` must be unique per source; every source
    * value must have a weight. Overflow guard: max rank · (L / min w)
    * must fit a long — true for any real corpus and sane weights.
    */
  /** The WFQ key stage shared by [[interleave]] and
    * [[interleaveAnnealed]]: per-source ranks from one global stamp
    * minus broadcast source offsets, integer virtual finish times,
    * missing weights loud. Returns the frame + `src_rank` + `vtime`
    * (the final position stamp is the caller's — the annealed variant
    * fuses a running total onto it).
    */
  private def withVtime(
      df: DataFrame,
      sourceCol: String,
      orderCol: String,
      weights: Seq[(String, Long)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 1),
      "weights must be positive")
    require(weights.map(_._1).distinct.size == weights.size, "duplicate source in weights")
    val l = weights.map(_._2).reduce(lcm)
    val mult = weights.map { case (s, w) => (s, l / w) }
    // ONE global stamp over (source, order) …
    val stamped = GlobalRank.withRowNumber(
      df, Seq(sourceCol, orderCol), rnCol = "_grn", nCol = "_gn",
      failOnTies = true).drop("_gn")
    // … minus each source's offset = rows in LEXICOGRAPHICALLY earlier
    // sources (a #sources-row aggregate, broadcast)
    val offsets = df.groupBy(col(sourceCol).as("_src")).agg(count(lit(1)).as("_n"))
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(
          org.apache.spark.sql.expressions.Window.orderBy("_src")
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("_src"), col("_offset"))
    val multExpr = mult.foldRight(lit(null).cast("long")) { case ((s, m), acc) =>
      when(col(sourceCol) === s, lit(m)).otherwise(acc)
    }
    // null-safe join: a NULL source must survive to the raise_error
    // check below (an equi-join would silently drop it first)
    stamped
      .join(broadcast(offsets), col(sourceCol) <=> col("_src"))
      .withColumn("src_rank", col("_grn") - col("_offset"))
      .withColumn("_m", multExpr)
      .withColumn("vtime", col("src_rank") * col("_m"))
      .drop("_grn", "_src", "_offset", "_m")
      .withColumn("vtime",
        when(col("vtime").isNull, raise_error(
          concat(lit(s"mixture: $sourceCol value without a weight: "), col(sourceCol))))
          .otherwise(col("vtime")))
  }

  def interleave(
      df: DataFrame,
      sourceCol: String,
      orderCol: String,
      weights: Seq[(String, Long)]): DataFrame =
    GlobalRank.withRowNumber(
      withVtime(df, sourceCol, orderCol, weights),
      Seq("vtime", sourceCol, orderCol),
      rnCol = "position", nCol = "_pn", failOnTies = true)
      .drop("_pn")
      .withColumn("position", col("position") - 1)

  /** DATA-CONSTRAINED epoch upsampling — when a source is too small for
    * its target mixture share, training repeats it for several epochs
    * (the data-constrained-scaling recipe: repeat low-resource sources
    * up to a repeat budget rather than starve their share). Each row
    * explodes into `repeats(source)` copies tagged `epoch` 0..R−1 — a
    * stateless explode, output volume = Σ R_s·|s| by construction; a
    * source without a repeat factor fails loudly. Feed the result to
    * [[interleave]] with an (epoch-major, doc) composite order so a
    * source's epoch-1 copies schedule after all its epoch-0 documents.
    */
  def upsampleEpochs(
      df: DataFrame,
      sourceCol: String,
      repeats: Seq[(String, Long)]): DataFrame = {
    require(repeats.nonEmpty && repeats.forall(_._2 >= 1),
      "repeat factors must be >= 1")
    require(repeats.map(_._1).distinct.size == repeats.size,
      "duplicate source in repeats")
    val rExpr = repeats.foldRight(lit(null).cast("long")) { case ((s, r), acc) =>
      when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    df.withColumn("_r",
      when(rExpr.isNull, raise_error(concat(
        lit(s"upsampleEpochs: $sourceCol value without a repeat factor: "),
        col(sourceCol))))
        .otherwise(rExpr))
      .withColumn("epoch", explode(sequence(lit(0L), col("_r") - 1)))
      .drop("_r")
  }

  /** TWO-PHASE (annealed) interleave — the end-of-training schedule
    * shape: the run consumes `phase1Tokens` tokens under `weights1`,
    * then the REMAINING documents reschedule under `weights2`
    * (typically upweighting the highest-quality sources for the final
    * anneal). Phase membership is prefix-closed by construction: a
    * document is phase 1 iff its exclusive token cumulative under the
    * phase-1 schedule STARTS before the boundary (the straddling doc
    * finishes in phase 1 — annealing boundaries are token-approximate,
    * and this is the rule that keeps the phase-1 set a clean prefix of
    * the phase-1 order). Output: every input row — ALL caller columns
    * carried through, like [[interleave]] — plus `phase` (1/2) and
    * `position` (0-based over the FULL two-phase schedule).
    *
    * Scale shape: one [[interleave]] (two range stamps) + one running
    * total + a second interleave over the phase-2 remainder + a 1-row
    * broadcast offset — five bounded exchanges total, never a
    * single-task window, at any corpus size.
    */
  def interleaveAnnealed(
      df: DataFrame,
      sourceCol: String,
      orderCol: String,
      nTokensCol: String,
      weights1: Seq[(String, Long)],
      weights2: Seq[(String, Long)],
      phase1Tokens: Long): DataFrame = {
    require(phase1Tokens >= 0, s"phase1Tokens=$phase1Tokens must be >= 0")
    // position AND the token cumulative ride ONE fused range exchange
    // over the phase-1 WFQ order (the rank+running-total fusion that
    // halved TokenBudget's shuffle at the 20M-doc probe)
    val c = GlobalRank.withRowNumberAndRunningTotal(
      withVtime(df, sourceCol, orderCol, weights1),
      Seq("vtime", sourceCol, orderCol), nTokensCol,
      rnCol = "position", cumCol = "_cum")
      .withColumn("position", col("position") - 1)
      .drop("src_rank", "vtime")
    val p1 = c.filter(col("_cum") < phase1Tokens)
    val p2in = c.filter(col("_cum") >= phase1Tokens)
      .drop("position", "_cum")
    // phase-2 remainder reschedules fresh under weights2; its positions
    // land after the phase-1 block (a 1-row broadcast count offset)
    val p2 = interleave(p2in, sourceCol, orderCol, weights2)
      .drop("src_rank", "vtime")
    val n1 = p1.agg(count(lit(1)).cast("long").as("_n1"))
    // carry EVERY caller column through (like interleave) — the phase
    // split must not silently project the frame down to its key columns
    val keep = df.columns.map(col).toSeq
    p1.select(col("position") +: lit(1).as("phase") +: keep: _*)
      .unionByName(p2
        .crossJoin(broadcast(n1))
        .select((col("position") + col("_n1")).as("position") +:
          lit(2).as("phase") +: keep: _*))
  }
}
