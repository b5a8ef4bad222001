package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule audit — the contract check that belongs
  * between ingest and publish (the reference validates schema shape only,
  * at `util/data_processing.py:240-258`; content rules are the missing
  * layer). Each rule is a VIOLATION predicate over a row; the audit
  * evaluates every rule in ONE scan — conditional sums in a single
  * aggregate, unpivoted to a (rule, n_checked, n_violations, pass) ledger —
  * never a scan per rule. At 100 TB, one pass vs R passes is the whole
  * game; rules ride the same codegen stage as the scan.
  *
  * A NULL predicate result counts as NOT violating — null semantics belong
  * to explicit `isNull` rules, not to every range rule's three-valued
  * accident.
  */
object Quality {

  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    require(rules.forall(!_._1.contains("'")), "rule names must not contain quotes")
    val aggs = count(lit(1)).as("_n") +: rules.map { case (name, violation) =>
      sum(when(coalesce(violation, lit(false)), 1L).otherwise(0L)).as(s"_v_$name")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules
      .map { case (name, _) => s"'$name', _n, `_v_$name`" }
      .mkString(", ")
    one
      .selectExpr(
        s"stack(${rules.size}, $stackArgs) AS (rule, n_checked, n_violations)")
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Benford first-digit audit: the leading-digit distribution of a
    * positive amount column against Benford's law p(d) = log₁₀(1 + 1/d) —
    * the classic fabricated-figures / broken-ETL detector (organically grown
    * magnitudes follow it; copy-pasted or unit-mangled ones don't).
    *
    * One scan: amounts → integer `scale`-units (exact), leading digit by
    * decimal string head (no fp log on the data path), counts per digit in
    * a 9-row aggregate. The expected share and each digit's χ² contribution
    * ARE fp — but computed on the 9-row result from exact counts and the
    * (constant-folded) log10 literals, with the shares pinned to a 10⁻⁹
    * grid so the audit is engine-reproducible. Σ chi2_term over the 9 rows
    * is the audit's χ² statistic (8 degrees of freedom).
    *
    * Non-positive and null amounts are excluded (Benford applies to
    * magnitudes); emits digits 1–9 even when a digit never occurs (n = 0).
    */
  def benfordAudit(df: DataFrame, amountCol: String, scale: Int = 100): DataFrame = {
    require(scale > 0, s"scale=$scale must be positive")
    val units = round(col(amountCol) * scale, 0).cast("long")
    val counts = df
      .select(units.as("_u"))
      .filter(col("_u") > 0)
      .select(substring(col("_u").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("n"))
    val digits = df.sparkSession.range(1, 10).select(col("id").cast("int").as("digit"))
    val full = digits.join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
    val total = sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy())
    // expected share pinned to 1e-9 BEFORE entering the χ² term, so the
    // only unpinned fp is the final per-row expression (then pin to 1e-6)
    val p = floor(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")) *
      lit(1000000000.0) + lit(0.5)).cast("double") / lit(1000000000.0)
    full
      .withColumn("_tot", total)
      .withColumn("expected_p", p)
      .withColumn("_e", col("_tot").cast("double") * col("expected_p"))
      .withColumn("chi2_term",
        floor((col("n").cast("double") - col("_e")) *
          (col("n").cast("double") - col("_e")) / col("_e") *
          lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0))
      .select("digit", "n", "expected_p", "chi2_term")
  }
}
