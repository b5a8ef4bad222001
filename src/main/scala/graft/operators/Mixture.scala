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
  def interleave(
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
    val ranked = stamped
      .join(broadcast(offsets), col(sourceCol) <=> col("_src"))
      .withColumn("src_rank", col("_grn") - col("_offset"))
      .withColumn("_m", multExpr)
      .withColumn("vtime", col("src_rank") * col("_m"))
      .drop("_grn", "_src", "_offset", "_m")
    val checked = ranked.withColumn("vtime",
      when(col("vtime").isNull, raise_error(
        concat(lit(s"mixture: $sourceCol value without a weight: "), col(sourceCol))))
        .otherwise(col("vtime")))
    GlobalRank.withRowNumber(checked, Seq("vtime", sourceCol, orderCol),
      rnCol = "position", nCol = "_pn", failOnTies = true)
      .drop("_pn")
      .withColumn("position", col("position") - 1)
  }
}
