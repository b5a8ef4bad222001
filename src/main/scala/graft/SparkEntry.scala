package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (and the
  * beyond-reference training-data operators) to a gate query; `oracleSql`
  * carries the DuckDB-equivalent SQL for the driver's correctness compare.
  */
object SparkEntry {

  /** All gate queries, grouped by module. */
  def allQs: Seq[Q] =
    ParityQueries.all ++ TrainingQueries.all ++ AnalyticsQueries.all ++
      AnalyticsQueriesB.all ++
      CurationQueries.all ++ CurationQueriesB.all ++
      WarehouseQueries.all ++ ExperimentQueries.all ++
      StatQueries.all ++ GovernanceQueries.all ++ FeatureQueries.all ++
      CorpusRuleQueries.all ++ ScaleOpsQueries.all ++ Round9Queries.all ++
      Round10Queries.all ++ Round11Queries.all ++ Round12Queries.all ++
      Round13Queries.all ++ Round14Queries.all ++ Round15Queries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q23_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
