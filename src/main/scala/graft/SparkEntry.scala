package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full query inventory lives in `graft.queries.*`; this object only
  * assembles it into the driver's shape.
  */
object SparkEntry {

  /** All declared queries, keyed by name (SURVEY.md §2 inventory). */
  def inventory: Map[String, GraftQuery] =
    CoreQueries.all ++ JoinQueries.all ++ TimeQueries.all ++
      TextQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ StreamQueries.all ++ AnalyticsQueries.all ++
      SourceQueries.all ++ PipelineQueries.all ++ GraphQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    inventory("q1_agg").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map { case (k, q) => k -> q.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    inventory.collect { case (k, GraftQuery(_, Some(sql), _)) => k -> sql }
}
