package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete oracle-checked operator surface; each entry has
  * a DuckDB-equivalent SQL in `oracleSql` unless the operator is not
  * SQL-expressible (hash-based sketches, custom sources), in which case the
  * driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's steady-state pipeline: filter → route → serialize.
    */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.queries("cdc_route_messages")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ AnalyticsQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      TemporalQueries.queries ++ RankMixQueries.queries ++
      CurationQueries.queries ++ ClassifierQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CdcQueries.oracle ++ AnalyticsQueries.oracle ++
      TextQueries.oracle ++ DedupQueries.oracle ++
      SimilarityQueries.oracle ++ MultimodalQueries.oracle ++
      TemporalQueries.oracle ++ RankMixQueries.oracle ++
      CurationQueries.oracle ++ ClassifierQueries.oracle
}
