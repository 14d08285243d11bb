package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.sources.Tables

/** Schema-drift canary for the events table's `ts` column.
  *
  * The driver has shipped events.parquet in three physical shapes across
  * testdata generations — parquet TIMESTAMP(NANOS) (arriving as LongType
  * nanos under `nanosAsLong`), `timestamp[us]` without timezone
  * (TimestampNTZType), and `timestamp[us]` UTC-adjusted (TimestampType).
  * A silent regeneration from one shape to another once broke 22
  * event-time queries at analysis time (`unix_micros`/`withWatermark`
  * reject NTZ). This spec writes an events fixture in each shape and
  * asserts `Tables.events` normalizes every one to µs TimestampType with
  * identical values — so the NEXT format drift fails one named test
  * instead of a fleet of queries.
  */
class EventsTsCanarySpec extends SparkSpec {

  private val us = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  /** Write an events.parquet fixture whose ts column is produced by
    * `tsExpr`, rooted in a fresh temp dir shaped like a testdata SF dir. */
  private def fixture(tsExpr: org.apache.spark.sql.Column): String = {
    val dir = graft.sources.TempDirs.create("graft_ts_canary_")
    spark.range(1, 4)
      .select(col("id").as("event_id"), tsExpr.as("ts"),
        (col("id") % 2).as("user_id"), lit("view").as("event_type"),
        lit(1.5).as("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def assertNormalized(dir: String, label: String): Unit = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"$label: expected TimestampType, got ${ev.schema("ts").dataType}")
    // unix_micros only analyzes on TimestampType — the exact call the
    // broken queries died on — and the value must round-trip unchanged
    val got = ev.select(unix_micros(col("ts"))).orderBy("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(us, us, us), s"$label: values drifted: $got")
  }

  test("micros-UTC (TimestampType) passes through") {
    assertNormalized(fixture(timestamp_micros(lit(us))), "micros-utc")
  }

  test("micros-NTZ (TimestampNTZType) is cast to TimestampType") {
    // under the pinned UTC session zone the NTZ wall time equals the
    // instant, so the cast must be value-identical
    assertNormalized(
      fixture(timestamp_micros(lit(us)).cast("timestamp_ntz")), "micros-ntz")
  }

  test("LongType nanos (legacy TIMESTAMP(NANOS) under nanosAsLong) truncates to micros") {
    // Spark cannot WRITE parquet TIMESTAMP(NANOS); a plain INT64 column
    // is exactly what nanosAsLong delivers to the reader, so it exercises
    // the same LongType branch of Tables.normalizeTs
    assertNormalized(fixture(lit(us * 1000L)), "long-nanos")
  }

  test("normalizeTs is value-identical across all three encodings for random timestamps") {
    // in-memory property check (no parquet round trip): the same epoch
    // micros presented as LongType nanos, NTZ, and LTZ must normalize to
    // identical TimestampType values — the invariant the oracle hashes
    // depend on
    val rnd = new scala.util.Random(11)
    val samples = Seq.fill(50)(1500000000000000L + (rnd.nextLong() % 200000000000000L).abs)
    import spark.implicits._
    val base = samples.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
    def normalized(tsExpr: org.apache.spark.sql.Column): Seq[Long] =
      Tables.normalizeTs(base.select(col("event_id"), tsExpr.as("ts")))
        .orderBy("event_id")
        .select(unix_micros(col("ts"))).as[Long].collect().toSeq
    val fromNanos = normalized((col("us") * 1000L).cast("long"))
    val fromNtz = normalized(timestamp_micros(col("us")).cast("timestamp_ntz"))
    val fromLtz = normalized(timestamp_micros(col("us")))
    assert(fromNanos == samples && fromNtz == samples && fromLtz == samples,
      "normalizeTs drifted between encodings")
  }

  test("streaming file-source read of an NTZ fixture yields a watermarkable column") {
    val dir = fixture(timestamp_micros(lit(us)).cast("timestamp_ntz"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = Tables.normalizeTs(
        spark.readStream.schema(schema).parquet(s"$dir/events.parquet"))
      .withWatermark("ts", "1 hour") // throws AnalysisException on NTZ
    assert(stream.schema("ts").dataType == TimestampType)
  }
}
