package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingOps.Event

/** Batch⇄streaming equivalence bridge: drives the Structured Streaming
  * operators over a MemoryStream of the events table and returns the sink
  * contents as a batch DataFrame, which makes the streaming module
  * oracle-checkable — its results are compared against the SAME DuckDB SQL
  * as the batch twins, instead of being trusted on spec assertions alone.
  *
  * MemoryStream is driver-fed by definition (it exists to inject
  * deterministic batches), so the event collect() here is harness shape,
  * not operator shape: the operators under test consume an unbounded
  * `readStream` in production, with watermark-bounded state (see
  * StreamingOps' scale notes), and nothing they do depends on the source
  * being a memory stream.
  */
object StreamingBridge {

  // memory-sink table names must be unique per run within a session
  private val runId = new java.util.concurrent.atomic.AtomicInteger

  private def loadEvents(spark: SparkSession, dir: String): Seq[Event] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
  }

  /** Streaming hourly windowed counts over a real FILE SOURCE stream
    * (`readStream.parquet` on the events table — the production shape,
    * nothing routed through the driver), driven to completion in one
    * batch. Complete mode: every window is emitted regardless of the
    * watermark, so the result is the batch answer. The ns→µs timestamp
    * fix mirrors Tables.events (parquet TIMESTAMP(NANOS) arrives as
    * LongType under nanosAsLong). */
  def streamHourlyEq(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // The file stream source monitors a DIRECTORY; testdata ships
    // events.parquet as a bare file, so stage it (copy, read-only
    // testdata can't be linked into) into a temp dir to stream. In
    // production the monitored ingest directory already exists.
    val src = new java.io.File(path)
    val streamDir =
      if (src.isDirectory) path
      else {
        val d = graft.sources.TempDirs.create("graft_stream_events_")
        java.nio.file.Files.copy(src.toPath,
          java.nio.file.Paths.get(d, "events.parquet"))
        d
      }
    val raw = spark.readStream.schema(schema).parquet(streamDir)
    val events =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val name = s"graft_stream_hourly_${runId.incrementAndGet()}"
    val q = StreamingOps.hourlyCounts(events)
      .writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy("hour")
  }

  /** Streaming sessionization driven to a closed state: all events in one
    * batch, then a far-future sentinel to advance the watermark past every
    * open session's timeout (the subsequent no-data batch fires the
    * event-time timeouts, emitting the final session per user). The
    * sentinel's own session is filtered out by its negative user id. */
  def streamSessionizeEq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Event]
    val name = s"graft_stream_sessions_${runId.incrementAndGet()}"
    val q = StreamingOps.sessionize(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      val evs = loadEvents(spark, dir)
      mem.addData(evs: _*)
      q.processAllAvailable()
      val maxMs = evs.iterator.map(_.ts.getTime).max
      mem.addData(Event(-1L, new java.sql.Timestamp(maxMs + 24L * 3600 * 1000),
        -1L, "flush", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    // sessions have no stable id in append output: order by the full value
    // tuple so the oracle compare is row-order deterministic
    spark.table(name).filter(col("user_id") >= 0)
      .select("user_id", "n_events", "duration_s")
      .orderBy("user_id", "n_events", "duration_s")
  }

  /** Streaming exact dedup driven to completion: one row survives per
    * (user, type) key. WHICH row survives a single unsorted batch is not
    * deterministic (first-seen per partition), so the equivalence is on
    * the retained KEY SET — exactly one row per distinct key, matching
    * batch DISTINCT — not on the winning row's payload. */
  def streamDedupEq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Event]
    val name = s"graft_stream_dedup_${runId.incrementAndGet()}"
    val q = StreamingOps.dedupStream(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      mem.addData(loadEvents(spark, dir): _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).select("user_id", "event_type")
      .orderBy("user_id", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_hourly_eq" -> streamHourlyEq,
    "stream_sessionize_eq" -> streamSessionizeEq,
    "stream_dedup_eq" -> streamDedupEq,
  )

  // Oracles are the batch twins' SQL (graft.operators.Analytics): streaming
  // and batch must produce the same answer over the same finite input.
  val oracle: Map[String, String] = Map(
    "stream_hourly_eq" ->
      ("SELECT date_trunc('hour', ts) AS hour, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "stream_dedup_eq" ->
      "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
    "stream_sessionize_eq" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events), " +
        "flagged AS (SELECT user_id, event_id, us, " +
        "CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 30*60*1000000 THEN 1 ELSE 0 END AS is_new " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), " +
        "sessions AS (SELECT user_id, us, " +
        "CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id " +
        "FROM flagged) " +
        "SELECT user_id, count(*) AS n_events, " +
        "CAST(floor((max(us) - min(us)) / 1000000) AS BIGINT) AS duration_s " +
        "FROM sessions GROUP BY user_id, session_id " +
        "ORDER BY user_id, n_events, duration_s"),
  )
}
