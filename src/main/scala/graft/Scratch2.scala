package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary canonicalization/reuse experiment — not part of the library
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // case 1: plain column agg reuse
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val a1 = base.groupBy("doc_id", "lang").agg(count(lit(1)).as("c"))
    val d1 = a1.filter(col("c") >= 1).groupBy("lang").agg(count(lit(1)).as("d"))
    val q1 = a1.join(broadcast(d1), "lang")
    q1.collect()
    report("plain", q1.queryExecution.executedPlan.toString)

    // case 2: with explode+split (no lambda)
    val pairs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val a2 = pairs.groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    val d2 = a2.filter(col("c") >= 1).groupBy("word").agg(count(lit(1)).as("d"))
    val q2 = a2.join(broadcast(d2), "word")
    q2.collect()
    report("explode", q2.queryExecution.executedPlan.toString)

    spark.stop()
  }

  private def report(tag: String, p: String): Unit = {
    java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/plan_$tag.txt"),
      p.getBytes("UTF-8"))
    val fin = p.split("\\+\\- == Initial Plan ==")(0)
    println(s"[scratch2] $tag scans=${"Scan parquet".r.findAllIn(fin).size} " +
      s"stages=${"ShuffleQueryStage".r.findAllIn(fin).size} " +
      s"distinctStages=${"ShuffleQueryStage (\\d+)".r.findAllIn(fin).matchData.map(_.group(1)).toSet}")
  }
}
