package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family lives in its own object under `graft.operators`
  * and contributes a (queries, oracle) pair; this object is only the
  * assembly point the driver harness reads.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WordCount.wordcount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    WordCount.queries ++ Relational.queries ++ MrQueries.queries ++
      Analytics.queries ++ TpcH2.queries ++ AdvancedSql.queries ++ EventAnalytics.queries ++
      Graph.queries ++ Layout.queries ++ DataOps.queries ++
      Dedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ Dsir.queries ++ Multimodal.queries ++
      graft.streaming.StreamingBridge.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    WordCount.oracle ++ Relational.oracle ++ MrQueries.oracle ++
      Analytics.oracle ++ TpcH2.oracle ++ AdvancedSql.oracle ++ EventAnalytics.oracle ++
      Graph.oracle ++ Layout.oracle ++ DataOps.oracle ++
      Dedup.oracle ++ Similarity.oracle ++
      TextAnalysis.oracle ++ Dsir.oracle ++ Multimodal.oracle ++
      graft.streaming.StreamingBridge.oracle
}
