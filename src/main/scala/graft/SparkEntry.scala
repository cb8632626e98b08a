package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-module inventories; each module
  * owns one section of SURVEY.md §2.
  */
object SparkEntry {

  private def modules: Seq[GraftQuery] =
    Relational.all ++ Relational2.all ++ Relational3.all ++
      PipelineQueries.all ++ LlmOps.all ++ SourceFormats.all ++
      SearchQueries.all ++ AnalyticsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The TPC-H-Q1-shaped pricing summary: full-scan grouped decimal
    * aggregation — always 6 groups at any SF. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.find(_.name == "q01_pricing_summary").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
