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

  /** Inverted index through the generic surface — a reduce that genuinely
    * needs the whole group (sorted distinct posting list), i.e. the case
    * where the reference's holistic contract is the right tool and a
    * combiner isn't. Output as a comma-joined string for engine-portable
    * comparison. */
  def mrInvertedIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)]
    MapReduce.mapReduce(
      docs,
      (d: (Long, String)) => MapReduce.wordCountMap(d._2).map { case (w, _) => (w, d._1) },
      (word: String, docIds: Iterator[Long]) =>
        (word, docIds.toSeq.distinct.sorted.mkString(",")))
      .toDF("word", "doc_ids")
      .orderBy("word")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_wordcount" -> mrWordcount,
    "mr_wordcount_combine" -> mrWordcountCombine,
    "mr_inverted_index" -> mrInvertedIndex,
  )

  val oracle: Map[String, String] = Map(
    "mr_wordcount" -> WordCount.oracle("wordcount"),
    "mr_wordcount_combine" -> WordCount.oracle("wordcount"),
    "mr_inverted_index" ->
      ("SELECT word, array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids " +
        "FROM (SELECT doc_id, unnest(string_split_regex(regexp_replace(text, '[^\\w\\s]+', '', 'g'), '\\s+')) AS word " +
        "FROM documents) WHERE length(word) > 0 GROUP BY word ORDER BY word"),
  )
}
