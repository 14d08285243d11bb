package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver testdata star schema
  * (`/root/repo/TESTDATA.md`).
  *
  * The reference engine's only source is a whole-file text scan
  * (/root/reference/src/mr/worker.rs:88-99); here every source is a columnar
  * parquet scan so Catalyst can push filters and prune columns — at 100 TB
  * the scan is the dominant cost and `PushedFilters`/`ReadSchema` on the
  * `FileSourceScanExec` are what keep it linear in the *needed* bytes, not
  * the stored bytes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to TimestampType. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true`, so the column arrives as
    * LongType nanos; truncating to micros here matches DuckDB's
    * `epoch_us(ts)` exactly, keeping event-time queries oracle-comparable. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
