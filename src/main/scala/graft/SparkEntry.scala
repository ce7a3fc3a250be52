package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, ApiQueries, DocQueries, EmbedQueries, EventQueries, MediaQueries, OlapQueries, SampleQueries, ServingQueries, SketchQueries, SqlQueries, TemporalQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY §2 inventory +
  * training-pipeline extensions) to a DataFrame program over a
  * testdata sf directory; `oracleSql` carries the DuckDB-equivalent
  * SQL for the hash-compare gate. Column names and types are aligned
  * pairwise (all-BIGINT numerics, epoch-ms longs for time).
  */
object SparkEntry {

  /** Flagship: the reference's headline pipeline — dedup → 1-minute
    * rollup → global top-10 by revenue (pinot/README.md first sample
    * query / DataGenerator.kt oracle) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.topKGlobalRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.queries ++ DocQueries.queries ++ EmbedQueries.queries ++
      TpchQueries.queries ++ MediaQueries.queries ++ ServingQueries.queries ++
      ApiQueries.queries ++ SqlQueries.queries ++ TemporalQueries.queries ++
      SampleQueries.queries ++ OlapQueries.queries ++ AnalyticsQueries.queries ++
      SketchQueries.queries

  def oracleSql: Map[String, String] =
    EventQueries.oracles ++ DocQueries.oracles ++ EmbedQueries.oracles ++
      TpchQueries.oracles ++ MediaQueries.oracles ++ ServingQueries.oracles ++
      ApiQueries.oracles ++ SqlQueries.oracles ++ TemporalQueries.oracles ++
      SampleQueries.oracles ++ OlapQueries.oracles ++ AnalyticsQueries.oracles ++
      SketchQueries.oracles
}
