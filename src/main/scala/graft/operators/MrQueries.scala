package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.mr.MapReduce
import graft.sources.Tables

/** The generic map/reduce surface (SURVEY.md §2.2) exercised as queries:
  * word count re-expressed through both reduce paths, cross-checked against
  * the DataFrame version by sharing its DuckDB oracle.
  */
object MrQueries {

  /** Holistic path: flatMap → groupByKey → mapGroups — the reference's
    * exact execution shape (whole group materialized per key). */
  def mrWordcount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val text = Tables.documents(spark, dir).select("text").as[String]
    MapReduce.mapReduce(
      text,
      MapReduce.wordCountMap,
      (k: String, vs: Iterator[Long]) => (k, vs.sum))
      .toDF("word", "cnt")
      .orderBy("word")
  }

  /** Combiner path: flatMap → Aggregator (partial+final HashAggregate) —
    * the scale-correct version for associative reductions. */
  def mrWordcountCombine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val text = Tables.documents(spark, dir).select("text").as[String]
    MapReduce.mapReduceCombine[String, String, Long, Long, Long](
      text,
      MapReduce.wordCountMap,
      0L, _ + _, _ + _, identity)
      .toDF("word", "cnt")
      .orderBy("word")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_wordcount" -> mrWordcount,
    "mr_wordcount_combine" -> mrWordcountCombine,
  )

  val oracle: Map[String, String] = Map(
    "mr_wordcount" -> WordCount.oracle("wordcount"),
    "mr_wordcount_combine" -> WordCount.oracle("wordcount"),
  )
}
