package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.mr.MapReduce

/** Tokenizer parity on the reference's actual corpus (Project Gutenberg
  * texts, /root/reference/src/resource/pg-*.txt — real punctuation,
  * apostrophes, unicode). Read-only access; skipped when absent. */
class GutenbergParitySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = new java.io.File("/root/reference/src/resource")

  test("Column tokenizer == Scala reference tokenizer on pg-0.txt, line by line") {
    assume(corpus.isDirectory, "reference corpus not present")
    val path = s"${corpus.getAbsolutePath}/pg-0.txt"
    assume(new java.io.File(path).isFile)
    val lines = spark.read.text(path)
    val sparkTokens = lines
      .select(TextFunctions.tokens(col("value")).as("t"))
      .as[Seq[String]].collect()
    val scalaTokens = lines.as[String].collect()
      .map(l => MapReduce.wordCountMap(l).map(_._1).toSeq)
    assert(sparkTokens.length == scalaTokens.length)
    sparkTokens.zip(scalaTokens).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"line $i differs")
    }
  }

  test("word count totals conserve tokens on the full 8-file corpus") {
    assume(corpus.isDirectory, "reference corpus not present")
    val lines = spark.read.text(s"${corpus.getAbsolutePath}/pg-*.txt")
    val wc = lines
      .select(explode(TextFunctions.tokens(col("value"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = wc.agg(sum("cnt")).as[Long].head()
    val direct = lines
      .select(size(TextFunctions.tokens(col("value"))).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(total == direct && total > 0)
    // no lowercasing: both cases survive when both occur (reference parity)
    val the = wc.filter($"word".isin("The", "the")).count()
    assert(the == 2)
  }
}
