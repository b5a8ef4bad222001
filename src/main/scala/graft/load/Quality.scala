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
}
