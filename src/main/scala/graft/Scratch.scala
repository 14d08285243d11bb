package graft

import org.apache.spark.sql.SparkSession

// temporary profiling harness — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (name <- args) {
      val t0 = System.nanoTime()
      val q = SparkEntry.queries(name)(spark, sfDir)
      if (sys.env.contains("SPARK_GRAFT_FINALPLAN")) q.collect()
      else q.write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      if (sys.env.contains("SPARK_GRAFT_FINALPLAN")) {
        val p = q.queryExecution.executedPlan.toString
        println(s"[scratch] $name scans=${"Scan parquet".r.findAllIn(p).size} " +
          s"reused=${"Reused".r.findAllIn(p).size} " +
          s"aqeReads=${"AQEShuffleRead".r.findAllIn(p).size}")
        java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/finalplan_$name.txt"),
          p.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
