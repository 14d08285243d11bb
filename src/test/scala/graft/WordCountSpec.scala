package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.WordCount

class WordCountSpec extends SparkSpec {
  import spark.implicits._

  test("tokenizer strips punctuation, keeps case, drops empties (reference wc::map parity)") {
    val df = Seq("Hello, world!  Hello_again  ", "", "a.b,c").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("toks"))
    val got = df.as[Seq[String]].collect().toSeq
    // Reference: regex [^\w\s] -> "" then split_whitespace; '_' is \w; no lowercasing.
    assert(got(0) == Seq("Hello", "world", "Hello_again"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq("abc")) // dots/commas removed, fragments merge — exact reference behavior
  }

  test("tokenizer is Unicode-aware like Rust regex \\w ((?U) flag)") {
    val got = Seq("héllo wörld! a¡b").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("toks"))
      .as[Seq[String]].collect().head
    assert(got == Seq("héllo", "wörld", "ab"))
  }

  test("wordcount: golden counts on a tiny in-memory corpus") {
    val df = Seq("the cat the dog", "The cat").toDF("text")
    df.createOrReplaceTempView("tiny")
    val got = df
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("the" -> 2L, "The" -> 1L, "cat" -> 2L, "dog" -> 1L))
  }

  test("wordcount on sf0.001: rows > 0, sorted, sum of counts == total tokens") {
    val wc = WordCount.wordcount(spark, sf).cache()
    val words = wc.select("word").as[String].collect()
    assert(words.nonEmpty)
    assert(words.sameElements(words.sorted(Ordering.String)))
    val totalFromWc = wc.agg(sum("cnt")).as[Long].head()
    val totalTokens = graft.sources.Tables.documents(spark, sf)
      .select(size(TextFunctions.tokens(col("text"))).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(totalFromWc == totalTokens)
    wc.unpersist()
  }

  test("entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).limit(1).count() > 0)
  }
}
