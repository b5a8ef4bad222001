package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate entry: a Spark query over the scale-factor directory plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same tables.
  * Column names MUST match between the two — the driver sorts columns by name
  * and hashes values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)

  /** [[graft.Par.run]] — overlap independent driver-side actions. */
  def concurrently[A](thunks: Seq[() => A]): Seq[A] = graft.Par.run(thunks)
}
