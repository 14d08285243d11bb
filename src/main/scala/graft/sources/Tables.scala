package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** events.ts has shipped in three physical parquet shapes across
    * testdata generations, all normalized here to µs TimestampType so
    * every event-time operator sees ONE type:
    *  - TIMESTAMP(NANOS): Spark 4 refuses to map it to TimestampType;
    *    sessions set `spark.sql.legacy.parquet.nanosAsLong=true`, so it
    *    arrives as LongType nanos — truncate to micros (matches DuckDB's
    *    `epoch_us(ts)` exactly).
    *  - timestamp[us] without timezone → TimestampNTZType: `unix_micros`
    *    and `withWatermark` reject NTZ, so cast to TimestampType; under
    *    the pinned UTC session zone the cast is value-identical to
    *    DuckDB's naive reading, so oracle hashes are unaffected.
    *  - timestamp[us] UTC-adjusted → TimestampType: pass through. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(table(spark, dir, "events"))

  /** Normalize a `ts` column of any of the three shipped physical types
    * (LongType nanos / TimestampNTZType / TimestampType) to µs
    * TimestampType. Shared by the batch loader above and the streaming
    * bridge's file-source reads. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
