package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import graft.sources.Tables
import graft.streaming.StreamingOps.Event

/** Batch⇄streaming equivalence bridge: drives the Structured Streaming
  * operators over a FILE-SOURCE stream of the events table and returns the
  * sink contents as a batch DataFrame, which makes the streaming module
  * oracle-checkable — its results are compared against the SAME DuckDB SQL
  * as the batch twins, instead of being trusted on spec assertions alone.
  *
  * All three queries stream from `readStream.parquet` on a staged copy of
  * the events table (the production shape — nothing is routed through the
  * driver; the only driver-side values are scalar aggregates like the max
  * event time used to place the watermark-advancing sentinel).
  */
object StreamingBridge {

  // memory-sink table names must be unique per run within a session
  private val runId = new java.util.concurrent.atomic.AtomicInteger

  private val eventCols = Seq("event_id", "ts", "user_id", "event_type", "value")

  /** Memoized base staging (one per (events fingerprint[, n]) per
    * process — keyed by DatasetId.key of the events source, not the raw
    * path, so regenerating the dataset in-process misses the cache):
    * bridges run the SAME staging for every query, so the expensive part
    * — the Spark write / file copy out of the read-only testdata tree —
    * happens once and each query gets a cheap per-query VIEW of it via
    * [[linkStaged]]. Bases are immutable after creation; only views are
    * ever handed to a query. */
  private val eventsStageMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, StructType)]
  private val timeOrderedStageMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]

  /** Per-query view of a staged base dir: hard-link every parquet file
    * into a fresh temp dir (copy with attributes if the filesystem
    * refuses links). Links share the base inodes, so the mtime ordering
    * the file source replays by is IDENTICAL to the base's — and the
    * sentinel files a bridge later drops into its view are new inodes in
    * a private dir, invisible to sibling queries and to the base. */
  private def linkStaged(base: String): String = {
    val d = graft.sources.TempDirs.create("graft_stage_view_")
    new java.io.File(base).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .foreach { f =>
        val dst = java.nio.file.Paths.get(d, f.getName)
        try java.nio.file.Files.createLink(dst, f.toPath)
        catch {
          case _: Exception => java.nio.file.Files.copy(f.toPath, dst,
            java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
        }
      }
    d
  }

  /** Stage the events table into a per-query temp directory the file
    * stream source can monitor. The source watches a DIRECTORY and
    * discovers new files per micro-batch; testdata ships events.parquet
    * as a bare file in a read-only tree, so it can neither be monitored
    * in place nor appended to with a sentinel. In production the
    * monitored ingest directory already exists. Returns (stream dir,
    * on-disk schema projected to the event columns — parquet resolves
    * columns by name, so the projection prunes the scan and lets
    * sentinel files carry only these five columns). */
  private def stageEvents(spark: SparkSession, dir: String): (String, StructType) = {
    val (base, proj) = eventsStageMemo.computeIfAbsent(
        graft.sources.DatasetId.key(s"$dir/events.parquet"), { _ =>
      val path = s"$dir/events.parquet"
      val schema = StructType(eventCols.map(spark.read.parquet(path).schema(_)))
      val d = graft.sources.TempDirs.create("graft_stream_events_")
      val src = new java.io.File(path)
      val parts =
        if (src.isDirectory) src.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        else Seq(src)
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(d, f"events_$i%05d.parquet"))
      }
      (d, schema)
    })
    (linkStaged(base), proj)
  }

  /** ts normalization mirroring Tables.events: LongType nanos (legacy
    * TIMESTAMP(NANOS) under nanosAsLong) → µs TimestampType, and
    * TimestampNTZType (timestamp[us] without timezone) → TimestampType,
    * which `withWatermark` requires. */
  private def fixTs(raw: DataFrame, schema: StructType): DataFrame =
    Tables.normalizeTs(raw)

  private def typedEventStream(spark: SparkSession, streamDir: String,
      schema: StructType): Dataset[Event] = {
    import spark.implicits._
    fixTs(spark.readStream.schema(schema).parquet(streamDir), schema)
      .select(eventCols.map(col): _*).as[Event]
  }

  /** Drop a one-row sentinel parquet file into the monitored directory:
    * the next micro-batch reads it, the watermark advances past every open
    * session's timeout, and the subsequent no-data batch fires the
    * event-time timeouts. This is also how a production ingest directory
    * closes its last sessions — event time only advances through data. */
  private[graft] def writeSentinel(spark: SparkSession, streamDir: String,
      schema: StructType, flushMs: Long): Unit =
    writeSentinelNamed(spark, streamDir, schema, flushMs, "zz_sentinel.parquet")

  private[graft] def writeSentinelNamed(spark: SparkSession, streamDir: String,
      schema: StructType, flushMs: Long, fileName: String,
      eventTypes: Seq[String] = Seq("flush")): Unit = {
    val tsVal: Any = schema("ts").dataType match {
      case LongType => flushMs * 1000000L
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ's external row type is LocalDateTime; session zone is UTC,
        // so epoch-millis → UTC wall time preserves the value exactly
        java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochMilli(flushMs), java.time.ZoneOffset.UTC)
      case _ => new java.sql.Timestamp(flushMs)
    }
    val rows: java.util.List[Row] = {
      val l = new java.util.ArrayList[Row]()
      eventTypes.foreach(t => l.add(Row(-1L, tsVal, -1L, t, 0.0)))
      l
    }
    val tmp = graft.sources.TempDirs.create("graft_stream_sentinel_")
    spark.createDataFrame(rows, schema)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written under $tmp"))
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(streamDir, fileName))
  }

  /** Streaming hourly windowed counts, driven to completion in one batch.
    * Complete mode: every window is emitted regardless of the watermark,
    * so the result is the batch answer. */
  def streamHourlyEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    val events = fixTs(spark.readStream.schema(schema).parquet(streamDir), schema)
    val name = s"graft_stream_hourly_${runId.incrementAndGet()}"
    val q = StreamingOps.hourlyCounts(events)
      .writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy("hour")
  }

  /** Streaming hourly aggregation through a real parquet FILE SINK with a
    * checkpoint — the production exactly-once output path: the sink's
    * commit log (_spark_metadata) records exactly the files of committed
    * batches, and the batch read-back lists through it, so a crashed or
    * duplicated batch can never surface partial output. Append mode emits
    * a window only once the watermark passes its end, so the far-future
    * sentinel both flushes every real window and proves the emitted set
    * is final; the sentinel's own window stays open and is never
    * written. */
  def streamFileSinkEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    val outDir = graft.sources.TempDirs.create("graft_stream_sink_out_")
    val ckDir = graft.sources.TempDirs.create("graft_stream_sink_ck_")
    val events = fixTs(spark.readStream.schema(schema).parquet(streamDir), schema)
    val q = StreamingOps.hourlyCounts(events)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("parquet").option("path", outDir)
      .start()
    try {
      q.processAllAvailable()
      val maxMs = Tables.events(spark, dir)
        .agg(max(col("ts"))).head().getTimestamp(0).getTime
      writeSentinel(spark, streamDir, schema, maxMs + 24L * 3600 * 1000)
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(outDir).orderBy("hour")
  }

  /** Hourly aggregation processed as MANY micro-batches — the events
    * table is re-staged as 4 separate files and the source capped at
    * `maxFilesPerTrigger = 1`, so the aggregate state must accumulate
    * across 4 genuine micro-batch boundaries (the single-big-batch runs
    * above never exercise cross-batch state merge for the windowed agg).
    * Complete mode: the final emission is the batch answer iff every
    * intermediate state handoff was correct. */
  def streamIncrementalEq(spark: SparkSession, dir: String): DataFrame = {
    val staged = graft.sources.TempDirs.create("graft_stream_incr_")
    Tables.events(spark, dir)
      .select(eventCols.map(col): _*)
      .repartition(4)
      .write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val name = s"graft_stream_incr_${runId.incrementAndGet()}"
    val q = StreamingOps.hourlyCounts(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(staged))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy("hour")
  }

  /** Streaming dead-letter quarantine — json_quarantine's streaming
    * twin, the split every production ingest stream runs: a text feed
    * carrying deliberately-broken rows (every 7th) is parsed with
    * `from_json` (corrupt → NULL struct), and ONE `foreachBatch` routes
    * each micro-batch to two sinks — parsed rows to the silver parquet
    * table, unparseable payloads verbatim to a dead-letter table for
    * replay. Neither failure mode stops the stream nor drops a row: the
    * final accounting (parsed langs + the NULL-lang quarantine bucket)
    * must reconcile against the batch oracle over the ORIGINAL corpus,
    * so a swallowed row anywhere breaks the hash. Split + both writes
    * are stateless map work at any scale; the feed is staged across 3
    * files read one per trigger, so routing also survives real
    * micro-batch boundaries. */
  def streamQuarantineEq(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.sources.TempDirs.create("graft_stream_quar_")
    Tables.documents(spark, dir)
      .select(when(col("doc_id") % 7 === 0,
          concat(lit("{broken!"), col("lang")))
        .otherwise(to_json(struct(col("doc_id"), col("lang"))))
        .as("value"))
      .repartition(3)
      .write.mode("overwrite").text(s"$root/feed")
    val parsed = spark.readStream
      .option("maxFilesPerTrigger", 1).text(s"$root/feed")
      .select(col("value"),
        from_json(col("value"),
          StructType.fromDDL("doc_id LONG, lang STRING")).as("j"))
    val q = parsed.writeStream
      .option("checkpointLocation", s"$root/ck")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // Route on one row-local predicate, inverted for the good side —
        // two map-only writes, no set-op shuffle inside the hot loop.
        val isBad = col("j").isNull || col("j.doc_id").isNull
        batch.filter(isBad).select("value")
          .write.mode("append").text(s"$root/dead")
        batch.filter(!isBad).select("j.doc_id", "j.lang")
          .write.mode("append").parquet(s"$root/good")
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val good = spark.read.parquet(s"$root/good")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), lit(0L).as("n_quarantined"),
        sum("doc_id").as("sum_ids"))
    val dead = spark.read.text(s"$root/dead")
      .agg(count(lit(1)).as("n"))
      .select(lit(null).cast("string").as("lang"), col("n"),
        col("n").as("n_quarantined"), lit(0L).as("sum_ids"))
    good.unionByName(dead).orderBy(asc_nulls_first("lang"))
  }

  /** Streaming hourly aggregation through `foreachBatch` — the
    * operational escape hatch for sinks Spark has no connector for
    * (OLTP upserts, search indexes, feature stores). Complete mode +
    * whole-result overwrite per micro-batch is the idempotence pattern:
    * a replayed batch id rewrites the same state, so at-least-once
    * delivery of batches yields exactly-once RESULTS without a commit
    * log. Checkpointed like any production stream. */
  def streamForeachBatchEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    val outDir = graft.sources.TempDirs.create("graft_stream_feb_out_")
    val ckDir = graft.sources.TempDirs.create("graft_stream_feb_ck_")
    val events = fixTs(spark.readStream.schema(schema).parquet(streamDir), schema)
    val q = StreamingOps.hourlyCounts(events)
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(outDir).orderBy("hour")
  }

  /** Streaming sessionization driven to a closed state: all events in the
    * initial batch, then a far-future sentinel file to advance the
    * watermark past every open session's timeout (the subsequent no-data
    * batch fires the event-time timeouts, emitting the final session per
    * user). The sentinel's own session is filtered out by its negative
    * user id. */
  def streamSessionizeEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    val name = s"graft_stream_sessions_${runId.incrementAndGet()}"
    val q = StreamingOps.sessionize(typedEventStream(spark, streamDir, schema))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      val maxMs = Tables.events(spark, dir)
        .agg(max(col("ts"))).head().getTimestamp(0).getTime
      writeSentinel(spark, streamDir, schema, maxMs + 24L * 3600 * 1000)
      q.processAllAvailable()
    } finally q.stop()
    // sessions have no stable id in append output: order by the full value
    // tuple so the oracle compare is row-order deterministic
    spark.table(name).filter(col("user_id") >= 0)
      .select("user_id", "n_events", "duration_s")
      .orderBy("user_id", "n_events", "duration_s")
  }

  /** Streaming sessionization via Spark's NATIVE session_window
    * aggregation — the declarative/stateful pairing of batch
    * sessionWindowAgg, closing the loop with the imperative
    * flatMapGroupsWithState sessionizer: three batch/stream
    * implementations, one oracle. Gap-bounded windows merge inside the
    * stateful aggregate (state per key is the user's OPEN sessions, not
    * events); append mode emits a session only once the watermark proves
    * it closed, so the far-future sentinel flushes the last open
    * sessions and the emitted set is final. duration = window end −
    * start − gap exactly (session_window end = last event + gap). */
  def streamSessionWindowEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    val gapUs = 30L * 60 * 1000000
    val name = s"graft_stream_sesswin_${runId.incrementAndGet()}"
    val events = fixTs(spark.readStream.schema(schema).parquet(streamDir), schema)
      .withWatermark("ts", "1 hour")
    val q = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      val maxMs = Tables.events(spark, dir)
        .agg(max(col("ts"))).head().getTimestamp(0).getTime
      writeSentinel(spark, streamDir, schema, maxMs + 24L * 3600 * 1000)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("user_id") >= 0)
      .select(col("user_id"), col("n_events"),
        floor((col("end_us") - col("start_us") - gapUs) / lit(1000000L))
          .cast("long").as("duration_s"))
      .orderBy("user_id", "n_events", "duration_s")
  }

  /** Sessionization via transformWithState with explicit event-time
    * timers — driven exactly like streamSessionizeEq (drain, far-future
    * sentinel advances the watermark, the no-data batch fires the
    * registered per-key alarms), same oracle: the modern API must land
    * on the same sessions as flatMapGroupsWithState and the two batch
    * sessionizers. */
  def streamSessionizeTwsEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    val name = s"graft_stream_sess_tws_${runId.incrementAndGet()}"
    val q = withRocksDb(spark) {
      StreamingOps.sessionizeTws(typedEventStream(spark, streamDir, schema))
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
    }
    try {
      q.processAllAvailable()
      val maxMs = Tables.events(spark, dir)
        .agg(max(col("ts"))).head().getTimestamp(0).getTime
      writeSentinel(spark, streamDir, schema, maxMs + 24L * 3600 * 1000)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("user_id") >= 0)
      .select("user_id", "n_events", "duration_s")
      .orderBy("user_id", "n_events", "duration_s")
  }

  /** Streaming dedup across micro-batch boundaries: time-ordered 4-file
    * one-per-trigger replay (range-staged with ascending mtimes — a
    * RANDOM split loses keys whose only events land behind the advancing
    * watermark; measured: 749 vs 750 keys), so dropDuplicates state must
    * suppress keys first seen in EARLIER batches. Key-set equivalence
    * with batch DISTINCT, as in streamDedupEq. */
  def streamDedupIncrementalEq(spark: SparkSession, dir: String): DataFrame = {
    val staged = stageTimeOrdered(spark, dir, 4)
    val schema = spark.read.parquet(staged).schema
    val name = s"graft_dedup_incr_${runId.incrementAndGet()}"
    val q = StreamingOps.dedupStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(staged))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).select("user_id", "event_type")
      .orderBy("user_id", "event_type")
  }

  /** Stage the events table as `n` time-range parquet files with
    * ascending mtimes, so the file source (ordered by timestamp, then
    * path) replays them chronologically — shared by the incremental
    * dedup/sessionize bridges and the whole transformWithState family.
    * The range keys are (ts, event_id) — the same total order the batch
    * twins and the per-batch sorts inside the stateful processors use —
    * so equal-timestamp events can never straddle a file (= micro-batch)
    * boundary in an order that differs from the batch (ts, event_id)
    * replay; without the tie-break, last-touch/prev state in the
    * tie-sensitive attribution twin could flip on a boundary split.
    * The ranged write (a Spark job over the full events table) runs ONCE
    * per (dir, n) per process; every query gets a private hard-link view
    * so its sentinels stay its own. */
  private[graft] def stageTimeOrdered(spark: SparkSession, dir: String, n: Int): String =
    linkStaged(timeOrderedStageMemo.computeIfAbsent(
        (graft.sources.DatasetId.key(s"$dir/events.parquet"), n), { _ =>
      val tmp = graft.sources.TempDirs.create("graft_incr_build_")
      Tables.events(spark, dir)
        .select(eventCols.map(col): _*)
        .repartitionByRange(n, col("ts"), col("event_id"))
        .write.mode("overwrite").parquet(tmp)
      val staged = graft.sources.TempDirs.create("graft_incr_")
      val parts = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      val base = System.currentTimeMillis() - 1000L * parts.length
      parts.zipWithIndex.foreach { case (f, i) =>
        val dst = java.nio.file.Paths.get(staged, f"events_$i%05d.parquet")
        java.nio.file.Files.copy(f.toPath, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(base + i * 1000L))
      }
      staged
    }))

  /** Sessionization across REAL micro-batch boundaries: events staged as
    * 4 time-range files (range partition i lands in part-0000i, so name
    * order = time order), mtimes set ascending so the file source's
    * (timestamp, path) ordering replays them chronologically at
    * `maxFilesPerTrigger = 1`. Sessions spanning adjacent ranges must
    * survive state handoff between batches, and the advancing watermark
    * closes stale sessions MID-STREAM via event-time timeout — the two
    * mechanisms the one-big-batch run cannot exercise. Ranges ascend, so
    * no cross-batch event is ever late; the sentinel flushes the last
    * open sessions. */
  def streamSessionizeIncrementalEq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val staged = stageTimeOrdered(spark, dir, 4)
    val schema = spark.read.parquet(staged).schema
    val name = s"graft_sess_incr_${runId.incrementAndGet()}"
    val q = StreamingOps.sessionize(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(staged).as[Event])
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      val maxMs = Tables.events(spark, dir)
        .agg(max(col("ts"))).head().getTimestamp(0).getTime
      writeSentinel(spark, staged, schema, maxMs + 24L * 3600 * 1000)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("user_id") >= 0)
      .select("user_id", "n_events", "duration_s")
      .orderBy("user_id", "n_events", "duration_s")
  }

  /** Streaming first/last-touch attribution across REAL micro-batch
    * boundaries: the same chronological 4-file staging as the
    * incremental sessionizer, because an open session (and its pending
    * last-touch candidate) must survive state handoff between batches —
    * a purchase in file 3 can be attributed to a first touch from file
    * 1. No sentinel and no watermark: attribution emits at arrival (the
    * decision needs only state already in hand), so the drain is
    * complete when the files are. Output must equal the batch
    * session_attribution window query row for row — same oracle. */
  def streamAttributionEq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val staged = stageTimeOrdered(spark, dir, 4)
    val schema = spark.read.parquet(staged).schema
    val name = s"graft_attrib_${runId.incrementAndGet()}"
    val q = withRocksDb(spark) {
      StreamingOps.attributionTws(
        fixTs(spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(staged), schema).select(eventCols.map(col): _*).as[Event])
        .writeStream.outputMode("update")
        .format("memory").queryName(name).start()
    }
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .orderBy("user_id", "session_id", "purchase_id")
  }

  /** BOUNDED-STATE streaming dedup via dropDuplicatesWithinWatermark —
    * the 100 TB answer to dedupStream's unbounded dropDuplicates state
    * (which grows with the key universe forever): state is evicted once
    * the watermark passes an entry's event time + delay, so steady-state
    * memory is (keys arriving within the delay window), not (all keys
    * ever). The dedup key therefore must bound duplicate spread in event
    * time — here (user_id, event_type, hour): duplicates of a key
    * co-occur within one hour by construction, and the 2 h delay covers
    * any same-hour straddle of a micro-batch boundary, so eviction can
    * never let a duplicate through. Replayed as 4 chronological files,
    * one per trigger, so state genuinely evicts mid-stream while the
    * suppression guarantee holds — output equals batch DISTINCT. */
  def streamDedupWatermarkEq(spark: SparkSession, dir: String): DataFrame = {
    val staged = stageTimeOrdered(spark, dir, 4)
    val schema = spark.read.parquet(staged).schema
    val name = s"graft_dedup_wm_${runId.incrementAndGet()}"
    val q = Tables.normalizeTs(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(staged))
      .withColumn("hour", date_trunc("hour", col("ts")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "hour")
      .select("user_id", "event_type", "hour")
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy("user_id", "event_type", "hour")
  }

  /** Streaming EWMA of hourly counts — the sequential-state twin of
    * batch ewma_hourly: 4 chronological files replayed one per trigger,
    * so the per-type hour fold and its 7-hour deque must roll across
    * real micro-batch boundaries; the far-future sentinel advances the
    * watermark past every open hour's end and the registered event-time
    * timers flush the tails. The sentinel's own 'flush' key is dropped
    * from the result. Same oracle as batch ewma_hourly. */
  def streamEwmaEq(spark: SparkSession, dir: String): DataFrame = {
    val staged = stageTimeOrdered(spark, dir, 4)
    val schema = spark.read.parquet(staged).schema
    val name = s"graft_stream_ewma_${runId.incrementAndGet()}"
    val q = withRocksDb(spark) {
      import spark.implicits._
      StreamingOps.ewmaHourlyTws(
          Tables.normalizeTs(spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(staged)).as[Event])
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
    }
    try {
      q.processAllAvailable()
      val maxMs = Tables.events(spark, dir)
        .agg(max(col("ts"))).head().getTimestamp(0).getTime
      writeSentinel(spark, staged, schema, maxMs + 24L * 3600 * 1000)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("event_type") =!= "flush")
      .orderBy("event_type", "hour_ts")
  }

  /** Streaming exact dedup driven to completion: one row survives per
    * (user, type) key. WHICH row survives a single unsorted batch is not
    * deterministic (first-seen per partition), so the equivalence is on
    * the retained KEY SET — exactly one row per distinct key, matching
    * batch DISTINCT — not on the winning row's payload. */
  def streamDedupEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    val name = s"graft_stream_dedup_${runId.incrementAndGet()}"
    val q = StreamingOps.dedupStream(typedEventStream(spark, streamDir, schema).toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name).select("user_id", "event_type")
      .orderBy("user_id", "event_type")
  }

  /** Stream-stream inner join driven to completion: views and purchases
    * are two filtered readers over the SAME staged file stream (two
    * independent file sources in one query — the production shape for a
    * topic read twice). Inner matches emit in the batch where both rows
    * are present, so one processAllAvailable suffices; no sentinel. */
  def streamJoinEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    def side(eventType: String): DataFrame =
      fixTs(spark.readStream.schema(schema).parquet(streamDir), schema)
        .filter(col("event_type") === eventType)
    val name = s"graft_stream_join_${runId.incrementAndGet()}"
    val q = StreamingOps.viewPurchaseJoin(side("view"), side("purchase"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name).orderBy("user_id", "view_id", "purchase_id")
  }

  /** Stream-stream LEFT OUTER interval join driven to completion:
    * matched pairs emit like the inner join, but an unmatched view's
    * null row emits only once the watermark PROVES no purchase can still
    * arrive inside [v_ts, v_ts + 1 h] — so after the first drain,
    * far-future sentinels push the watermark past every open window and
    * later drains flush the null rows. The sentinels must be TYPED (one
    * 'view' + one 'purchase' row, user_id −1): Catalyst pushes the
    * event-type filters below the watermark operator, so each branch's
    * event-time stats see only rows of its own type and a neither-type
    * 'flush' row would never advance the query watermark (= min across
    * branches). Sentinel rows are excluded from the result by user_id.
    * Two sentinel batches, because outer-join null emission lags state
    * eviction by one micro-batch. */
  def streamLeftJoinEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    val events = fixTs(spark.readStream.schema(schema).parquet(streamDir), schema)
      .withWatermark("ts", "1 hour")
    def side(eventType: String): DataFrame =
      events.filter(col("event_type") === eventType)
    val name = s"graft_stream_ljoin_${runId.incrementAndGet()}"
    val q = StreamingOps.viewPurchaseLeftJoin(side("view"), side("purchase"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      val maxMs = Tables.events(spark, dir)
        .agg(max(col("ts"))).head().getTimestamp(0).getTime
      writeSentinelNamed(spark, streamDir, schema, maxMs + 24L * 3600 * 1000,
        "zz_sentinel.parquet", Seq("view", "purchase"))
      q.processAllAvailable()
      writeSentinelNamed(spark, streamDir, schema, maxMs + 48L * 3600 * 1000,
        "zz_sentinel2.parquet", Seq("view", "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("user_id") >= 0)
      .orderBy("user_id", "view_id", "purchase_id")
  }

  /** Stream-static broadcast enrichment driven to completion: every
    * event joins its nation dimension row map-side (stateless — no
    * watermark, no state store), the bronze→silver enrichment shape.
    * One processAllAvailable suffices; nothing is held back. */
  def streamEnrichEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    val events = fixTs(spark.readStream.schema(schema).parquet(streamDir), schema)
    val name = s"graft_stream_enrich_${runId.incrementAndGet()}"
    val q = StreamingOps.enrichWithDim(events,
        Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name")),
        "n_nationkey")
      .select(col("event_id"), col("user_id"), col("n_name"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy("event_id")
  }

  /** mapGroupsWithState latest-per-key driven to completion. The memory
    * sink accumulates one update row per key per micro-batch; the final
    * state is the row with the highest cumulative count (n_events grows
    * monotonically), selected with an aggregate — never trusting batch
    * boundaries, which the file source doesn't guarantee. */
  def streamLatestEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    val name = s"graft_stream_latest_${runId.incrementAndGet()}"
    val q = StreamingOps.latestPerUser(typedEventStream(spark, streamDir, schema))
      .writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name)
      .groupBy("user_id")
      .agg(max_by(
        struct(col("last_us"), col("last_event_id"), col("last_type"), col("n_events")),
        struct(col("n_events"), col("last_us"), col("last_event_id"))).as("m"))
      .select(col("user_id"), col("m.last_us").as("last_us"),
        col("m.last_event_id").as("last_event_id"),
        col("m.last_type").as("last_type"), col("m.n_events").as("n_events"))
      .orderBy("user_id")
  }

  /** latest-per-key through the MODERN transformWithState API (Spark 4's
    * StatefulProcessor) — same drive and final-state selection as
    * streamLatestEq, same oracle, so the old and new arbitrary-state
    * APIs are proven equivalent on the same input. transformWithState
    * requires the RocksDB state store; the provider is scoped to this
    * query (set before start, restored after — queries bind their
    * provider at start). */
  /** Start a streaming query with the RocksDB state store provider scoped
    * to it (transformWithState requires RocksDB; a query binds its
    * provider at start, so set-before/restore-after is exact scoping). */
  private def withRocksDb[T](spark: SparkSession)(start: => T): T = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try start
    finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  def streamLatestTwsEq(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schema) = stageEvents(spark, dir)
    val name = s"graft_stream_latest_tws_${runId.incrementAndGet()}"
    val q = withRocksDb(spark) {
      StreamingOps.latestPerUserTws(typedEventStream(spark, streamDir, schema))
        .writeStream.outputMode("update")
        .format("memory").queryName(name).start()
    }
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name)
      .groupBy("user_id")
      .agg(max_by(
        struct(col("last_us"), col("last_event_id"), col("last_type"), col("n_events")),
        struct(col("n_events"), col("last_us"), col("last_event_id"))).as("m"))
      .select(col("user_id"), col("m.last_us").as("last_us"),
        col("m.last_event_id").as("last_event_id"),
        col("m.last_type").as("last_type"), col("m.n_events").as("n_events"))
      .orderBy("user_id")
  }

  /** Warm-started latest-per-key: the backfill→streaming migration
    * pattern end to end. The chronologically-staged events are split in
    * half; a BATCH aggregate computes per-user state over the first half
    * (the backfill job), the streaming query starts FROM that state via
    * StatefulProcessorWithInitialState and folds only the second half
    * (the live feed), and the serving view is sink ∪ backfill with a
    * per-key max_by — which must equal the batch answer over ALL events
    * (same oracle as the other latest twins). Proves initial-state
    * seeding composes with the fold: n_events accumulates from the
    * backfilled count, tie-breaks respect the backfilled argmax. */
  def streamLatestWarmStartEq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val staged = stageTimeOrdered(spark, dir, 4)
    val parts = new java.io.File(staged).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val liveDir = graft.sources.TempDirs.create("graft_warm_live_")
    parts.drop(2).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(liveDir, f.getName),
        java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    }
    val backfill = Tables.normalizeTs(
        spark.read.parquet(parts.take(2).map(_.getPath).toIndexedSeq: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(max_by(struct(col("us"), col("event_id"), col("event_type")),
          struct(col("us"), col("event_id"))).as("m"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("m.us").as("last_us"),
        col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_type"), col("n"))
    val init = backfill.as[StreamingOps.LatestInit]
    val schema = spark.read.parquet(liveDir).schema
    val name = s"graft_warm_latest_${runId.incrementAndGet()}"
    val q = withRocksDb(spark) {
      StreamingOps.latestPerUserWarmStart(
          Tables.normalizeTs(spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(liveDir))
            .select(eventCols.map(col): _*).as[StreamingOps.Event],
          init)
        .writeStream.outputMode("update")
        .format("memory").queryName(name).start()
    }
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name)
      .unionByName(backfill.withColumnRenamed("n", "n_events"))
      .groupBy("user_id")
      .agg(max_by(
        struct(col("last_us"), col("last_event_id"), col("last_type"), col("n_events")),
        struct(col("n_events"), col("last_us"), col("last_event_id"))).as("m"))
      .select(col("user_id"), col("m.last_us").as("last_us"),
        col("m.last_event_id").as("last_event_id"),
        col("m.last_type").as("last_type"), col("m.n_events").as("n_events"))
      .orderBy("user_id")
  }

  /** Per-user event-type histogram through MapState, replayed as 4
    * micro-batches so map entries accumulate across batch boundaries;
    * counts only grow, so the final histogram is the per-(user, type)
    * max over the update stream. Oracle: plain batch GROUP BY. */
  def streamTypeHistEq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val staged = stageTimeOrdered(spark, dir, 4)
    val schema = spark.read.parquet(staged).schema
    val name = s"graft_type_hist_${runId.incrementAndGet()}"
    val q = withRocksDb(spark) {
      StreamingOps.typeHistPerUser(
          Tables.normalizeTs(spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(staged))
            .select(eventCols.map(col): _*).as[StreamingOps.Event])
        .writeStream.outputMode("update")
        .format("memory").queryName(name).start()
    }
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name)
      .groupBy("user_id", "event_type").agg(max("n").as("n"))
      .orderBy("user_id", "event_type")
  }

  /** Per-user 3-most-recent events through ListState, replayed over 4
    * micro-batches; the serving row per key is the emission with the
    * highest n_seen (counts only grow). Oracle: batch top-3 window. */
  def streamRecent3Eq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val staged = stageTimeOrdered(spark, dir, 4)
    val schema = spark.read.parquet(staged).schema
    val name = s"graft_recent3_${runId.incrementAndGet()}"
    val q = withRocksDb(spark) {
      StreamingOps.recent3PerUser(
          Tables.normalizeTs(spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(staged))
            .select(eventCols.map(col): _*).as[StreamingOps.Event])
        .writeStream.outputMode("update")
        .format("memory").queryName(name).start()
    }
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name)
      .groupBy("user_id")
      .agg(max_by(struct(col("n_seen"), col("e1"), col("e2"), col("e3")),
        col("n_seen")).as("m"))
      .select(col("user_id"), col("m.n_seen").as("n_seen"),
        col("m.e1").as("e1"), col("m.e2").as("e2"), col("m.e3").as("e3"))
      .orderBy("user_id")
  }

  /** Streaming CDC upsert — the maintenance loop of a materialized table:
    * the batch cdc_apply's change feed (diffSnapshots of the two demo
    * order snapshots) replays one key-disjoint file per micro-batch, and
    * each batch MERGEs into a versioned keyed state — anti-join the
    * current state on the batch's touched keys, union the insert/update
    * rows, write state v(id+1). This is exactly Delta/Iceberg MERGE's
    * copy-on-write shape without a table format: reading v(id) and
    * overwriting v(id+1) keyed by the deterministic batchId makes a
    * retried batch rewrite the same version from the same input —
    * idempotent, so the sink is exactly-once without a commit log.
    *
    * At scale the state is partitioned by key range and a MERGE rewrites
    * only partitions the batch touches (the anti-join's broadcast side is
    * the batch's key set, which is the delta, not the corpus); the full
    * rewrite here is the sf-small demo of that shape. Final state must
    * equal the independently-recomputed target snapshot — the SAME oracle
    * as batch cdc_apply. */
  def streamCdcEq(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataOps
    val (base, target) = DataOps.demoSnapshots(spark, dir)
    val diff = DataOps.diffSnapshots(base, target, "o_orderkey", "v")
      .select(col("o_orderkey"), col("change"), col("new_value"))
    // stage the feed as 3 key-disjoint files with ascending mtimes so the
    // file source replays them as 3 separate micro-batches
    val staged = graft.sources.TempDirs.create("graft_cdc_feed_")
    val tsBase = System.currentTimeMillis() - 10000L
    (0 until 3).foreach { i =>
      val tmp = graft.sources.TempDirs.create(s"graft_cdc_build_${i}_")
      diff.filter(pmod(col("o_orderkey"), lit(3)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      val dst = java.nio.file.Paths.get(staged, f"cdc_$i%05d.parquet")
      java.nio.file.Files.copy(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(tsBase + i * 1000L))
    }
    val stateRoot = graft.sources.TempDirs.create("graft_cdc_state_")
    base.write.mode("overwrite").parquet(s"$stateRoot/v0")
    val ck = graft.sources.TempDirs.create("graft_cdc_ck_")
    val feedSchema = spark.read.parquet(staged).schema
    val q = spark.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val cur = s.read.parquet(s"$stateRoot/v$id")
        val touched = batch.select("o_orderkey").distinct()
        val upserts = batch.filter(col("change").isin("insert", "update"))
          .select(col("o_orderkey"), col("new_value").as("v"))
        cur.join(broadcast(touched), Seq("o_orderkey"), "left_anti")
          .unionByName(upserts)
          .write.mode("overwrite").parquet(s"$stateRoot/v${id + 1}")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val last = new java.io.File(stateRoot).listFiles()
      .map(_.getName).filter(_.startsWith("v")).map(_.drop(1).toInt).max
    spark.read.parquet(s"$stateRoot/v$last").orderBy("o_orderkey")
  }

  /** Per-process streaming-ingested IVF roots (same lifecycle as the
    * batch incremental index memo in Similarity): the build + 3-batch
    * stream ingest runs once; re-entry (Verify, warm+measure bench runs)
    * is a pure read-back, and a half-ingested index is never exposed
    * because the memo inserts only after the stream drains cleanly. */
  private val ivfIngestMemo =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), String]

  private def ivfIngestRoot(spark: SparkSession, dir: String): String = {
    ivfIngestMemo.keys.filter(_._1.sparkContext.isStopped)
      .foreach(ivfIngestMemo.remove)
    ivfIngestMemo.getOrElseUpdate((spark, graft.sources.DatasetId.key(dir)), {
      import graft.operators.Similarity
      val root = graft.sources.TempDirs.create("graft_stream_ivf_")
      val isNew = col("vec_id") % 10 === 0
      Similarity.ivfBuildIndexFrom(
        Similarity.emb(spark, dir).filter(!isNew), spark, root)
      // stage the delta as 3 id-ranged files with ascending mtimes →
      // 3 real micro-batches at maxFilesPerTrigger=1
      val deltaDir = stageRangedFiles(
        Similarity.emb(spark, dir).filter(isNew), 3, "vec_id",
        "graft_stream_ivf_delta_")
      val schema = spark.read.parquet(deltaDir).schema
      val cents = spark.read.parquet(s"$root/centroids")
      val ck = graft.sources.TempDirs.create("graft_stream_ivf_ck_")
      val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(deltaDir)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.sources.ArtifactRoots.boundedWrite(
              Similarity.assignCells(batch, cents))
            .mode("append").partitionBy("cell").parquet(s"$root/lists")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      root
    })
  }

  /** Public warm-up for Bench: force the one-time resident build + stream
    * ingest so the chain is billed separately from the read-back cost. */
  def streamIvfIngestWarm(spark: SparkSession, dir: String): String =
    withStateParts(spark)(ivfIngestRoot(spark, dir))

  /** Streaming ANN ingest — the streaming twin of batch ivf_incremental,
    * closing the last batch/streaming pairing gap in the similarity
    * family: the resident corpus (vec_id ≢ 0 mod 10) builds a PRIVATE
    * copy of the IVF index once, then the SAME delta (vec_id ≡ 0 mod 10)
    * arrives as a 3-file stream and each micro-batch is assigned against
    * the STORED centroids (map-only over the batch, broadcast K-row
    * centroid table) and parquet-APPENDED to the cell-partitioned
    * inverted lists inside a checkpointed foreachBatch — O(|batch|) per
    * trigger, existing list files never read or rewritten: the
    * steady-state ingest loop of a production vector store. Read-back
    * and oracle are ivf_incremental's: append-time assignment under the
    * stored centroids must equal a from-scratch assignment of the full
    * corpus, REGARDLESS of how the delta was micro-batched. */
  def streamIvfIngestEq(spark: SparkSession, dir: String): DataFrame = {
    val root = ivfIngestRoot(spark, dir)
    spark.read.parquet(s"$root/lists")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        (col("vec_id") % 10 === 0).cast("int").as("is_new"))
      .orderBy("vec_id")
  }

  /** Stage a projection of the documents table as `n` doc_id-ranged
    * parquet files with ascending mtimes (one file per micro-batch at
    * maxFilesPerTrigger=1) — the document-corpus counterpart of
    * stageTimeOrdered, shared by the artifact-serving twins (BPE encode,
    * quality gate). Memoized via [[stagedFor]]: fingerprint-checked per
    * (path, stage tag), so an in-process regeneration of the dataset is
    * a cache miss here exactly as it is for the artifact memos
    * (bpeRootMemo/gateSpecMemo) — a path-only memo would replay the
    * stale staged corpus while the freshly fingerprinted artifacts
    * retrain, silently diverging batch from stream. Repeated
    * bench/oracle drives on unchanged data still reuse the staged files
    * instead of re-paying the corpus write + copies; superseded stages
    * are deleted on rebuild. No sentinels are ever written into these dirs, so
    * queries can share the staged dir directly (each brings its own
    * checkpoint) — no private link views needed. Per-doc outputs are
    * order-independent, so no tie-break discipline is needed either; the
    * range split just guarantees real multi-batch replay. */
  private val docsStageMemo =
    new scala.collection.concurrent.TrieMap[(String, String), (String, String)]

  /** Staged-dir memoization with SUPERSESSION — the chainMemo discipline
    * applied to on-disk stages: keyed by stable identity (source path +
    * stage tag), the VALUE carries the staging-time dataset fingerprint.
    * A hit under a changed fingerprint (dataset regenerated in place) is
    * a miss that also DELETES the superseded staged dir, so a
    * process-lifetime embedder can't accumulate one dead staged corpus /
    * panel per regeneration (the r16 shape keyed by DatasetId.key —
    * fingerprint inside the key — which made stale entries unreachable
    * but never evicted). Rebuild-under-race can leak one dir (the
    * streaming rows run serially in verify/bench; a leaked dir is temp
    * space, not correctness). If the serial-drive assumption ever
    * relaxes, switch the check-then-act to compute/putIfAbsent and
    * defer deletion of the superseded dir to process exit — an eager
    * delete could yank a stage a still-running stream is reading. */
  private[graft] def stagedFor(dir: String, tag: String)(build: => String): String = {
    val fp = graft.sources.DatasetId.fingerprint(dir)
    docsStageMemo.get((dir, tag)) match {
      case Some((`fp`, staged)) => staged
      case stale =>
        stale.foreach { case (_, old) =>
          try graft.sources.ArtifactRoots.deleteRecursively(
            java.nio.file.Paths.get(old))
          catch { case scala.util.control.NonFatal(_) => () }
        }
        val staged = build
        docsStageMemo.put((dir, tag), (fp, staged))
        staged
    }
  }

  /** THE file-staging primitive of every bridge: write `df` as `n`
    * range-split parquet files with ascending mtimes under a fresh temp
    * dir — one file per micro-batch at `maxFilesPerTrigger=1`. One
    * implementation (part-file filter, 1 s mtime spacing, name-sorted
    * order) shared by the corpus stages, the IVF ingest delta, and the
    * chunk-retrieval query panel, so the batch-ordering semantics every
    * `stream_*_eq` oracle depends on cannot silently fork per caller. */
  private[streaming] def stageRangedFiles(df: DataFrame, n: Int,
      rangeCol: String, prefix: String): String = {
    val build = graft.sources.TempDirs.create(s"${prefix}build_")
    df.repartitionByRange(n, col(rangeCol)).write.mode("overwrite").parquet(build)
    val out = graft.sources.TempDirs.create(prefix)
    val parts = new java.io.File(build).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val tsBase = System.currentTimeMillis() - 1000L * parts.length
    parts.zipWithIndex.foreach { case (f, i) =>
      val dst = java.nio.file.Paths.get(out, f"batch_$i%05d.parquet")
      java.nio.file.Files.copy(f.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(tsBase + i * 1000L))
    }
    out
  }

  private def stageDocsRanged(spark: SparkSession, dir: String, n: Int,
      cols: Seq[String]): String =
    stagedFor(dir, s"docs:$n:${cols.mkString(",")}") {
      stageRangedFiles(
        Tables.documents(spark, dir).select(cols.map(col): _*),
        n, "doc_id", "graft_stream_docs_")
    }

  /** Streaming BPE encode — the tokenizer's inference half run as a
    * stream, closing the last batch/streaming pairing gap in the text
    * family: the PERSISTED merge table (the parquet artifact
    * `TextAnalysis.bpeIndexRoot` writes; trained once on the full corpus)
    * is loaded as driver literals, then the document corpus arrives as 3
    * doc_id-ranged files (one per micro-batch at maxFilesPerTrigger=1)
    * and each batch is encoded independently — per-doc fertility rows
    * depend only on the doc's own words and the shipped merge file, so
    * batch-wise encode + parquet append is value-identical to the batch
    * corpus pass, and the SAME oracle as bpe_encode gates the result.
    * This is the production shape: a tokenizer service holds the merge
    * artifact and encodes arriving documents with no corpus-wide state. */
  def streamBpeEncodeEq(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val merges = TextAnalysis.bpeMergeTable(spark, dir)
    val docsDir = stageDocsRanged(spark, dir, 3, Seq("doc_id", "text"))
    val schema = spark.read.parquet(docsDir).schema
    val outDir = graft.sources.TempDirs.create("graft_stream_bpe_out_")
    val ck = graft.sources.TempDirs.create("graft_stream_bpe_ck_")
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        TextAnalysis.bpeEncodeDocs(batch, merges)
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(outDir).orderBy("doc_id")
  }

  /** Streaming quality gate — the curation gate run as a stream under a
    * corpus-trained SPEC, the third artifact-reuse pairing (after the IVF
    * index and the BPE merge table): the batch side trains the gate spec
    * on the full corpus — per-lang threshold scores plus the EXPLICIT
    * roster of threshold-tied admitted docs — and the stream scores each
    * arriving micro-batch with the identical row-local arithmetic and
    * applies the spec as a pure predicate (quality > qt OR doc_id ∈
    * roster). Tie resolution is global by construction (baked into the
    * shipped roster), so no batch boundary can flip an admission — which
    * is exactly why a rank-within-batch formulation would be WRONG here
    * and the spec artifact is the production shape. The spec is RELOADED
    * from the persisted parquet artifact (`TextAnalysis.gateSpecRoot`,
    * same atomic-build protocol as the BPE/IVF artifacts) — training and
    * serving communicate only through the shipped files. Output must
    * equal batch quality_gate row for row; same oracle. */
  def streamQualityGateEq(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val specRoot = graft.sources.ArtifactRoots.assertComplete(
      TextAnalysis.gateSpecRoot(spark, dir))
    // the shipped spec: a per-lang threshold table (≤ #langs rows) and the
    // tie roster (≤ Σ per-lang tie-group), reloaded as driver literals
    val qtRows = spark.read.parquet(s"$specRoot/thresholds")
      .select("lang", "qt").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val roster = spark.read.parquet(s"$specRoot/roster")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val docsDir = stageDocsRanged(spark, dir, 3, Seq("doc_id", "lang", "text"))
    val schema = spark.read.parquet(docsDir).schema
    val outDir = graft.sources.TempDirs.create("graft_stream_qg_out_")
    val ck = graft.sources.TempDirs.create("graft_stream_qg_ck_")
    // gate predicate as a pure codegen'd Column over spec literals: the
    // per-lang threshold folds into a CASE chain, the roster into an IN
    // list — no join, no lambda, map-only per batch
    val qtExpr = qtRows.foldLeft(lit(Double.MaxValue)) { case (acc, (l, t)) =>
      when(col("lang") === lit(l), lit(t)).otherwise(acc)
    }
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        TextAnalysis.scoreDocsFrame(batch)
          .select("doc_id", "lang", "quality")
          .filter(col("quality") > qtExpr ||
            col("doc_id").isInCollection(roster))
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(outDir).orderBy("doc_id")
  }

  /** Streaming DSIR scoring — the importance-resampling family's
    * artifact-reuse pairing: the batch side fits the hashed-n-gram
    * bucket models once and ships the per-bucket log-likelihood-ratio
    * table as a persisted parquet artifact (`Dsir.modelRoot`, atomic
    * build protocol); the stream reloads it as a dense lr-by-bucket
    * array (256 longs — driver literals, no broadcast needed) and
    * scores each arriving micro-batch ROW-LOCALLY with
    * `Dsir.scoreFrame`: weight = fold over the doc's own grams of
    * lr[bucket(gram)], an INDEPENDENT derivation of the batch side's
    * Σ_b c_b·lr_b aggregate dot product. Per-doc output depends only on
    * the doc and the shipped model, so batch-wise append is
    * value-identical to the corpus pass — the SAME oracle as batch
    * dsir_weights gates the result. This is the production ingest
    * shape: fit the selection model on the resident corpus, score new
    * documents at the door. */
  def streamDsirWeightsEq(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dsir
    val root = graft.sources.ArtifactRoots.assertComplete(
      Dsir.modelRoot(spark, dir))
    // the artifact's own row count IS the model width — a 10k-bucket
    // model scores at 10k; the serving side never consults session conf
    val lrRows = spark.read.parquet(s"$root/lr")
      .select("bucket", "lr_nano").collect()
    val lrByBucket = Array.ofDim[Long](lrRows.length)
    lrRows.foreach(r => lrByBucket(r.getLong(0).toInt) = r.getLong(1))
    val docsDir = stageDocsRanged(spark, dir, 3, Seq("doc_id", "lang", "text"))
    val schema = spark.read.parquet(docsDir).schema
    val outDir = graft.sources.TempDirs.create("graft_stream_dsir_out_")
    val ck = graft.sources.TempDirs.create("graft_stream_dsir_ck_")
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Dsir.scoreFrame(batch, lrByBucket)
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(outDir).orderBy("doc_id")
  }

  /** Streaming decontamination — the fourth artifact-reuse pairing
    * (after IVF ingest, BPE encode, quality gate), closing the batch/
    * streaming gap for the decontamination family: the benchmark split's
    * distinct char-8-gram set is a PERSISTED parquet artifact
    * (`Dedup.benchGramRoot`, same atomic-build protocol), reloaded here
    * as a sorted array plus a Bloom sketch built over it, both broadcast
    * once; the training corpus then arrives as 3 doc_id-ranged files and
    * each micro-batch is screened entirely ROW-LOCALLY — per doc, a
    * Bloom-probe count and an independent binary-search exact count
    * against the shipped gram set (independent so the no-false-negative
    * column is a live check, not a tautology), no join, no shuffle, no
    * state store. This is the production
    * ingest shape: the benchmark registry ships its sketch, arriving
    * documents are screened at the door. Per-doc results depend only on
    * the doc's own grams and the shipped artifact, so batch-wise append
    * is value-identical to the batch pass — the SAME oracle as
    * decontaminate_bloom gates the result. */
  def streamDecontaminateEq(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val benchGrams = spark.read.parquet(
        s"${graft.sources.ArtifactRoots.assertComplete(
          Dedup.benchGramRoot(spark, dir))}/grams")
      .collect().map(_.getLong(0)).sorted
    val bf = org.apache.spark.util.sketch.BloomFilter.create(
      math.max(benchGrams.length.toLong, 10000L), 0.01)
    benchGrams.foreach(bf.putLong)
    val bgB = spark.sparkContext.broadcast(benchGrams)
    val bfB = spark.sparkContext.broadcast(bf)
    val docsDir = stageDocsRanged(spark, dir, 3, Seq("doc_id", "text"))
    val schema = spark.read.parquet(docsDir).schema
    val outDir = graft.sources.TempDirs.create("graft_stream_decon_out_")
    val ck = graft.sources.TempDirs.create("graft_stream_decon_ck_")
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val session = batch.sparkSession
        import session.implicits._
        batch.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions { it =>
            val bg = bgB.value
            val f = bfB.value
            it.map { case (id, text) =>
              var shared = 0L
              var flagged = 0L
              Dedup.gramSet8(text).foreach { g =>
                // both counts independently, like the batch pass: the
                // exact binary-search count never consults the sketch,
                // so `flagged >= shared` is a REAL per-doc check of the
                // Bloom's no-false-negative guarantee — gating the
                // exact check behind the Bloom probe would make the
                // comparison true by construction and unable to fire
                if (f.mightContainLong(g)) flagged += 1
                if (java.util.Arrays.binarySearch(bg, g) >= 0) shared += 1
              }
              (id, shared, if (shared >= 5) 1 else 0, flagged >= shared)
            }
          }
          .toDF("doc_id", "n_shared", "contaminated", "no_false_negative")
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(outDir).orderBy("doc_id")
  }

  /** Streaming BM25 model maintenance — the fifth batch/stream pairing,
    * the serving half of `bm25_model_refresh`: the resident corpus's
    * lexical model (per-word df + the (N, TL) scalars) is materialized
    * once as version-0 state, then the delta (doc_id ≡ 0 mod 10)
    * arrives as micro-batches and each trigger folds the BATCH's model
    * increment into a new state version — a vocabulary-sized merge by
    * addition, valid because batch doc sets are disjoint, so the final
    * version must equal a from-scratch retrain REGARDLESS of how the
    * delta was micro-batched. Per-trigger cost is O(|batch| + vocab),
    * never a corpus re-scan — the index-freshness loop of a production
    * retrieval stack, and the same versioned-state shape as the CDC
    * twin. Gated by bm25_model_refresh's full-retrain oracle. */
  def streamBm25RefreshEq(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val stateRoot = graft.sources.TempDirs.create("graft_stream_bm25_")
    def writeModel(df: DataFrame, sc: DataFrame, v: Long): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stateRoot/v$v/df")
      sc.coalesce(1).write.mode("overwrite").parquet(s"$stateRoot/v$v/sc")
    }
    val base = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val (dfB, scB) = TextAnalysis.bm25ModelParts(base)
    writeModel(dfB, scB, 0)
    val ver = new java.util.concurrent.atomic.AtomicLong(0)
    val docsDir = stageDocsRanged(spark, dir, 3, Seq("doc_id", "text"))
    val schema = spark.read.parquet(docsDir).schema
    val ck = graft.sources.TempDirs.create("graft_stream_bm25_ck_")
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        // The state version is DERIVED from the batchId (v = batchId+1,
        // prior = batchId), never from a driver-side counter: foreachBatch
        // is at-least-once, and a counter incremented after the merge
        // would let a retried batch fold its delta into a fresh version —
        // double-counting df/N/TL. Keyed by batchId, a retry re-reads the
        // same prior version (which its own earlier attempt never wrote)
        // and OVERWRITES the same output version: idempotent by layout.
        val cur = batchId
        val (dfI, scI) = TextAnalysis.bm25ModelParts(
          batch.filter(col("doc_id") % 10 === 0).select("doc_id", "text"))
        val dfM = session.read.parquet(s"$stateRoot/v$cur/df")
          .unionByName(dfI).groupBy("word").agg(sum("df").as("df"))
        val scM = session.read.parquet(s"$stateRoot/v$cur/sc")
          .crossJoin(scI.select(col("n").as("ni"), col("tl").as("tli")))
          .select((col("n") + col("ni")).as("n"), (col("tl") + col("tli")).as("tl"))
        writeModel(dfM, scM, cur + 1)
        ver.getAndUpdate(v => math.max(v, cur + 1))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val last = ver.get()
    spark.read.parquet(s"$stateRoot/v$last/df")
      .crossJoin(broadcast(spark.read.parquet(s"$stateRoot/v$last/sc")
        .select(col("n").as("n_docs"), col("tl").as("total_tokens"))))
      .select("word", "df", "n_docs", "total_tokens")
      .orderBy("word")
  }

  /** Streaming retrieval serving — the sixth batch/stream pairing, and
    * the QUERY-side twin (every earlier twin streamed the corpus; here
    * the corpus is the served artifact and the QUERIES stream): the
    * panel's 10 query docs arrive as 3 doc_id-ranged micro-batches, and
    * each trigger is answered entirely from the persisted chunk-serving
    * index (`TextAnalysis.chunkIndexRoot` — bucketed postings + BM25
    * model, atomic-build/marker protocol): the batch's docs are scored
    * against the SHIPPED model (tf/dl row-local, df from the vocabulary
    * table, the same integer kernel by construction —
    * bm25ScoreAgainstModel), each query's top-3 terms then probe the
    * postings through a broadcast join keyed on (wb, word), so the
    * corpus-sized grid is read only in the ≤3 buckets the terms hash to
    * — never scanned whole — and the shared diversity cut (per-doc cap,
    * global top-5, both TopKAggregator folds) finishes the answer.
    * Per-query results depend only on the query's own text and the
    * shipped artifacts, so batch-wise append is value-identical to the
    * batch pass: the SAME oracle as chunk_retrieval gates the result. */
  def streamChunkRetrievalEq(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val root = graft.sources.ArtifactRoots.assertComplete(
      TextAnalysis.chunkIndexRoot(spark, dir))
    val postings = spark.read.parquet(s"$root/postings")
    val modelDf = spark.read.parquet(s"$root/model_df")
    val scRow = spark.read.parquet(s"$root/model_sc").head()
    val (n, tl, maxdl) = (scRow.getAs[Long]("n"), scRow.getAs[Long]("tl"),
      scRow.getAs[Long]("maxdl"))
    // stage the query panel as 3 id-ranged files with ascending mtimes —
    // 3 real micro-batches at maxFilesPerTrigger=1
    val panelDir = stagedFor(dir, "panel:chunk") {
      stageRangedFiles(
        graft.sources.Tables.documents(spark, dir)
          .filter(col("doc_id") < 10).select("doc_id", "text"),
        3, "doc_id", "graft_stream_chunk_panel_")
    }
    val schema = spark.read.parquet(panelDir).schema
    val outDir = graft.sources.TempDirs.create("graft_stream_chunk_out_")
    val ck = graft.sources.TempDirs.create("graft_stream_chunk_ck_")
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(panelDir)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val wQt = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(desc("bm25"), asc("word"))
        val qterms = TextAnalysis.bm25ScoreAgainstModel(
            batch.select("doc_id", "text"), modelDf, n, tl, maxdl)
          .withColumn("rn", row_number().over(wQt))
          .filter(col("rn") <= 3)
          .select(col("doc_id").as("qid"), col("word"),
            expr("bm25 div 1000").as("w"))
          .withColumn("wb", TextAnalysis.wordBucket(col("word")))
        val scored = postings.join(broadcast(qterms), Seq("wb", "word"))
          .filter(col("doc_id") =!= col("qid"))
          .groupBy("qid", "doc_id", "chunk_id")
          .agg(sum(col("cnt") * col("w")).as("score"))
        // per-batch OVERWRITE keyed by the deterministic batchId (the
        // streamCdcEq discipline): foreachBatch is at-least-once, and a
        // plain append would duplicate a retried batch's answers —
        // rewriting b<batchId> makes retries idempotent. Dir name
        // deliberately not `batch=<id>`: partition discovery would
        // inject a spurious column; recursiveFileLookup disables it.
        TextAnalysis.chunkDiversityCut(scored)
          .write.mode("overwrite").parquet(s"$outDir/b$batchId")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.option("recursiveFileLookup", "true").parquet(outDir)
      .orderBy("qid", "chunk_rank")
  }

  /** Streaming hybrid retrieval serving — the full RAG serving loop as
    * a stream, the seventh batch/stream pairing and the second
    * query-side twin: query panels (text + embedding vector per query
    * doc) arrive as 3 micro-batches and each trigger is answered
    * end-to-end from three persisted artifacts —
    *
    *  - the IVF index (`Similarity.ivfServeTopK`: arriving vectors rank
    *    the stored centroids via a broadcast K-row table, then the
    *    DPP-pruned inverted-list top-10 — the production ANN leg),
    *  - the BM25 model (chunkidx's `model_df`/`model_sc`: the arriving
    *    doc's top-3 terms derived by the shared integer kernel), and
    *  - the lexical postings (`lexidx`: per-(doc, word) BM25 bucketed
    *    by word hash — the batch's terms read ≤3 of 64 partitions of a
    *    corpus-sized index, never the whole thing),
    *
    * fused by the SAME `lexTopK` + `rrfFuse` code the batch hybrids
    * use, per-batch output OVERWRITTEN keyed by batchId
    * (retry-idempotent). Per-query answers depend only on the query's
    * own text/vector and the shipped artifacts, so micro-batching is
    * value-invisible: gated by hybrid_rrf_ivf's exact oracle. */
  def streamHybridRrfEq(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Similarity, TextAnalysis}
    val chunkRoot = graft.sources.ArtifactRoots.assertComplete(
      TextAnalysis.chunkIndexRoot(spark, dir))
    val lexRoot = graft.sources.ArtifactRoots.assertComplete(
      TextAnalysis.lexIndexRoot(spark, dir))
    val ivfRoot = Similarity.ivfWarmIndex(spark, dir)
    val modelDf = spark.read.parquet(s"$chunkRoot/model_df")
    val scRow = spark.read.parquet(s"$chunkRoot/model_sc").head()
    val (n, tl, maxdl) = (scRow.getAs[Long]("n"), scRow.getAs[Long]("tl"),
      scRow.getAs[Long]("maxdl"))
    val lexPost = spark.read.parquet(s"$lexRoot/postings")
    // FULL OUTER union of the two query domains: the batch oracle fuses
    // the legs full_outer, so a query doc with text but no embedding
    // row (or vice versa) still gets a one-leg fused ranking — an
    // inner-joined panel would silently drop it from the stream while
    // the oracle answers it (the current fixture aligns the two 1:1,
    // which would mask the divergence until a generator change)
    val panel = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") < 10).select("doc_id", "text")
      .join(Similarity.emb(spark, dir).filter(col("vec_id") < 10)
        .select(col("vec_id").as("doc_id"), col("v")), Seq("doc_id"), "full_outer")
    val panelDir = stagedFor(dir, "panel:hybrid") {
      stageRangedFiles(panel, 3, "doc_id", "graft_stream_hybrid_panel_")
    }
    val schema = spark.read.parquet(panelDir).schema
    val outDir = graft.sources.TempDirs.create("graft_stream_hybrid_out_")
    val ck = graft.sources.TempDirs.create("graft_stream_hybrid_ck_")
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(panelDir)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val depth = 10
        val wQt = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(desc("bm25"), asc("word"))
        val qterms = TextAnalysis.bm25ScoreAgainstModel(
            batch.filter(col("text").isNotNull).select("doc_id", "text"),
            modelDf, n, tl, maxdl)
          .withColumn("rn", row_number().over(wQt))
          .filter(col("rn") <= 3)
          .select(col("doc_id").as("qid"), col("word"))
          .withColumn("wb", TextAnalysis.wordBucket(col("word")))
        val lex = Similarity.lexTopK(
          lexPost.join(broadcast(qterms), Seq("wb", "word"))
            .filter(col("doc_id") =!= col("qid")), depth)
        val ann = Similarity.ivfServeTopK(spark, ivfRoot,
            batch.filter(col("v").isNotNull)
              .select(col("doc_id").as("qid"), col("v").as("qv")),
            depth, admitted = None)
          .select(col("qid"), col("cand_id"), col("rn").as("ar"))
        Similarity.rrfFuse(ann, lex)
          .write.mode("overwrite").parquet(s"$outDir/b$batchId")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.option("recursiveFileLookup", "true").parquet(outDir)
      .orderBy("qid", "rrf_rank")
  }

  /** Streaming position-level dedup screen — substring_dedup_incr run
    * as the ingest service it models: arriving documents (the
    * doc_id ≡ 0 mod 10 split) stream in five deterministic ntile
    * micro-batches, and each trigger is screened by the ONE kernel the
    * batch row uses (`Dedup.screenArrivalsAgainst`) against the
    * persisted resident window-hash index UNIONED with the versioned
    * arrival-hash state — so boilerplate entering across triggers is
    * still caught once its first carrier has arrived. State is the
    * arrival window-hash set as per-trigger DELTA dirs keyed by batchId
    * (d<batchId> overwrites on retry), per-trigger output overwritten
    * at b<batchId>: at-least-once safe end to end, O(batch) state write
    * per trigger.
    *
    * Stream-vs-batch semantics, stated honestly: the batch row judges
    * recurrence over the WHOLE arrival split at once, the stream can
    * only know arrivals up to the current trigger — an arrival-only
    * duplicate pair split across triggers is flagged on the LATER
    * carrier only (first-wins, the dedup_incremental discipline). The
    * oracle encodes exactly that trigger-aware rule (b.trg <= a.trg
    * over the same ntile(5) assignment staged here). On the current
    * corpus every recurring arrival window is also resident-backed, so
    * oracle-level divergence from the batch rule is fixture-vacuous;
    * the divergence cases are therefore pinned SYNTHETICALLY in
    * StreamingSpec (same-trigger pair → both flagged, cross-trigger →
    * later only) so a generator change cannot silently mask a fork.
    *
    * Scale shape per trigger: delta-sized hashing + island merge, one
    * broadcast-probe of the index/state hash columns — the corpus text
    * is never re-read; state grows with DISTINCT arrival hashes only. */
  def streamSubstringDedupEq(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val winRoot = graft.sources.ArtifactRoots.assertComplete(
      Dedup.winIndexRoot(spark, dir))
    val arrivals = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0).select("doc_id", "text")
    val docsDir = stageSubstrArrivals(spark, dir, arrivals)
    // arrival-hash state as per-trigger DELTA dirs folded into a
    // snapshot every K triggers (DeltaState): writing d<batchId>
    // (overwrite — retry-idempotent) costs O(batch) per trigger, the
    // periodic fold amortizes to O(state/K) per trigger, and a trigger
    // READS O(snapshot + K) dirs regardless of stream age — not the
    // O(triggers) union growth of unfolded deltas. Duplicate hashes
    // across deltas are harmless (the screen kernel distincts its probe
    // result); the fold distincts to keep the snapshot set-sized.
    val stateRoot = graft.sources.TempDirs.create("graft_stream_substr_state_")
    val outDir = graft.sources.TempDirs.create("graft_stream_substr_out_")
    val ck = graft.sources.TempDirs.create("graft_stream_substr_ck_")
    val schema = spark.read.parquet(docsDir).schema
    val foldK = DeltaState.foldK(spark, stateRoot) // pinned to the root — see foldK
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        val statePaths = DeltaState.priorPaths(session, stateRoot, "d",
          batchId, foldK, fold = _.distinct())
        val prior =
          if (statePaths.isEmpty) session.read.parquet(s"$winRoot/hashes")
          else session.read.parquet(s"$winRoot/hashes")
            .unionByName(session.read.parquet(statePaths: _*))
        Dedup.screenArrivalsAgainst(batch, prior)
          .write.mode("overwrite").parquet(s"$outDir/b$batchId")
        Dedup.windowHashSet(batch)
          .write.mode("overwrite").parquet(s"$stateRoot/d$batchId")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.option("recursiveFileLookup", "true").parquet(outDir)
      .orderBy("doc_id")
  }

  /** Streaming exact set-similarity screen — dedup_setsim_incr run as
    * the ingest service it models: the arriving split streams in the
    * same five ntile micro-batches the substring twin uses, and each
    * trigger runs the ONE candidate+verify tail the batch row uses
    * (`Dedup.setsimScreenWith`) against the persisted setsimidx prefix
    * postings + gram sets UNIONED with the per-trigger arrival state —
    * so a near-dup pair split across triggers is caught when its later
    * carrier arrives. Unlike the substring twin there is NO
    * trigger-aware semantics fork: the output is pairwise and each
    * qualifying pair is emitted exactly once (within-batch pairs by the
    * self-join, cross-trigger and vs-resident pairs by the prefix probe
    * when the later doc arrives), with trigger-independent values — so
    * the accumulated union equals the batch row bit-exactly and the
    * oracle IS dedup_setsim_incr's.
    *
    * State per trigger: the batch's gram sets (g<batchId>) and prefix
    * postings (p<batchId>) as delta dirs, overwritten by batchId —
    * retry-idempotent, O(batch) written per trigger; ranking uses the
    * resident df only (unseen grams rank cnt-0), so a doc's prefix is
    * IDENTICAL whichever trigger carries it — the Lemma-1 total order
    * never shifts with arrival history. The screen reads the state back
    * rather than recomputing lineage, and the one persisted frame per
    * trigger (the gram barrier, see Dedup.arrivalPrefix) is
    * unpersisted before the trigger returns. */
  def streamSetsimDedupEq(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val root = graft.sources.ArtifactRoots.assertComplete(
      Dedup.setsimIndexRoot(spark, dir))
    val arrivals = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0).select("doc_id", "text")
    val docsDir = stageSubstrArrivals(spark, dir, arrivals)
    val stateRoot = graft.sources.TempDirs.create("graft_stream_setsim_state_")
    val outDir = graft.sources.TempDirs.create("graft_stream_setsim_out_")
    val ck = graft.sources.TempDirs.create("graft_stream_setsim_ck_")
    val schema = spark.read.parquet(docsDir).schema
    val foldK = DeltaState.foldK(spark, stateRoot) // pinned to the root — see foldK
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        val df = session.read.parquet(s"$root/df")
        val ag = Dedup.gramSetsOf(batch.select("doc_id", "text")).persist()
        ag.write.mode("overwrite").parquet(s"$stateRoot/g$batchId")
        Dedup.arrivalPrefix(ag, df)
          .write.mode("overwrite").parquet(s"$stateRoot/p$batchId")
        ag.unpersist()
        val agW = session.read.parquet(s"$stateRoot/g$batchId")
        val apW = session.read.parquet(s"$stateRoot/p$batchId")
        // both state families fold every K triggers (DeltaState): a
        // trigger reads O(snapshot + K) state dirs, never O(triggers)
        val priorP = DeltaState.priorPaths(session, stateRoot, "p", batchId, foldK)
        val priorG = DeltaState.priorPaths(session, stateRoot, "g", batchId, foldK)
        val prefixAll =
          if (priorP.isEmpty) session.read.parquet(s"$root/prefix")
          else session.read.parquet(s"$root/prefix")
            .unionByName(session.read.parquet(priorP: _*))
        val gramsAll =
          if (priorG.isEmpty) session.read.parquet(s"$root/grams")
          else session.read.parquet(s"$root/grams")
            .unionByName(session.read.parquet(priorG: _*))
        Dedup.setsimScreenWith(agW, apW, prefixAll, gramsAll)
          .write.mode("overwrite").parquet(s"$outDir/b$batchId")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.option("recursiveFileLookup", "true").parquet(outDir)
      .orderBy("id1", "id2")
  }

  private val substrStageMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** Stage the arrival split as 5 EXPLICIT ntile(doc_id) files — not
    * stageRangedFiles: repartitionByRange draws sampled boundaries, and
    * this twin's oracle must reproduce the trigger assignment exactly,
    * so the split is pinned to ntile(5) OVER (ORDER BY doc_id) on both
    * sides. The window is arrival-sized (staging fixture, not the
    * operator path). */
  private def stageSubstrArrivals(spark: SparkSession, dir: String,
      arrivals: DataFrame): String =
    substrStageMemo.computeIfAbsent(graft.sources.DatasetId.key(dir), { _ =>
      val wNt = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      val withT = arrivals.withColumn("trg", ntile(5).over(wNt))
      val build = graft.sources.TempDirs.create("graft_stream_substr_build_")
      withT.coalesce(1).write.partitionBy("trg").mode("overwrite").parquet(build)
      val out = graft.sources.TempDirs.create("graft_stream_substr_docs_")
      val tsBase = System.currentTimeMillis() - 6000L
      // ntile(5) over fewer than 5 rows emits fewer groups — stage the
      // trigger dirs actually present (the oracle's ntile assignment is
      // identical either way), rather than NPE-ing on a missing trg dir
      (1 to 5).foreach { t =>
        val partDir = new java.io.File(s"$build/trg=$t")
        val srcs = Option(partDir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .sortBy(_.getName)
        srcs.headOption.foreach { src =>
          val dst = java.nio.file.Paths.get(out, f"batch_$t%05d.parquet")
          java.nio.file.Files.copy(src.toPath, dst)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(tsBase + t * 1000L))
        }
      }
      out
    })

  /** Scope the state-partition count to the bridge call: stateful
    * operators bind `spark.sql.shuffle.partitions` into the checkpoint at
    * query start, and each state partition is a live store instance
    * (RocksDB database / HDFS-backed map) that pays open + commit +
    * snapshot I/O EVERY micro-batch. The batch session's 32 is sized for
    * corpus shuffles, not for the bridge feeds' key cardinality — 32
    * stores × 4 triggers × 23 queries is pure fixed overhead, so the
    * bridges pin 8 for the duration of the drive (results are
    * partitioning-invariant and every bridge sorts its output). At 100 TB
    * this is the same knob sized the other way: state partitions follow
    * key volume and executor count, never the session default. Scoping is
    * exact for the streaming side because every bridge drains its query
    * eagerly before returning; the returned DataFrame is a batch read of
    * the sink and executes under the caller's own partitions. */
  // bridge-drive mutual exclusion. A PRIVATE lock, deliberately not the
  // SparkSession's own monitor: Scala lazy-val initialization inside
  // SparkSession synchronizes on the session instance, so holding that
  // monitor across a whole streaming drive could deadlock against a
  // streaming-execution thread touching a not-yet-initialized lazy val.
  private val statePartsLock = new Object

  private def withStateParts[T](spark: SparkSession)(body: => T): T =
    // the save/set/restore mutates session-global conf, so serialize all
    // bridge drives: concurrent callers from different threads would
    // otherwise race the save/restore and could reinstate a stale value.
    // The monitor is reentrant, so a nested scoped call on the same
    // thread is safe (its restore writes back the outer pin).
    statePartsLock.synchronized {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.getOption(key)
      // every state partition is a live store instance paying open +
      // commit + snapshot I/O per trigger; the r16 fixed-cost probe
      // (BENCH_r16_probe_streamcost) A/B'd 8 vs 4 across the family —
      // results are partitioning-invariant (every bridge sorts its
      // output), the knob exists to size stores to key volume
      spark.conf.set(key,
        spark.conf.getOption("spark.graft.streamStateParts")
          .orElse(sys.env.get("GRAFT_STREAM_STATE_PARTS")).getOrElse("4"))
      try body
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

  private def scoped(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (spark, dir) => withStateParts(spark)(f(spark, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_cdc_eq" -> scoped(streamCdcEq),
    "stream_ivf_ingest_eq" -> scoped(streamIvfIngestEq),
    "stream_latest_eq" -> scoped(streamLatestEq),
    "stream_latest_tws_eq" -> scoped(streamLatestTwsEq),
    "stream_latest_warm_eq" -> scoped(streamLatestWarmStartEq),
    "stream_foreachbatch_eq" -> scoped(streamForeachBatchEq),
    "stream_incremental_eq" -> scoped(streamIncrementalEq),
    "stream_hourly_eq" -> scoped(streamHourlyEq),
    "stream_file_sink_eq" -> scoped(streamFileSinkEq),
    "stream_sessionize_eq" -> scoped(streamSessionizeEq),
    "stream_session_window_eq" -> scoped(streamSessionWindowEq),
    "stream_sessionize_tws_eq" -> scoped(streamSessionizeTwsEq),
    "stream_sessionize_incr_eq" -> scoped(streamSessionizeIncrementalEq),
    "stream_attribution_eq" -> scoped(streamAttributionEq),
    "stream_dedup_eq" -> scoped(streamDedupEq),
    "stream_enrich_eq" -> scoped(streamEnrichEq),
    "stream_dedup_incr_eq" -> scoped(streamDedupIncrementalEq),
    "stream_dedup_wm_eq" -> scoped(streamDedupWatermarkEq),
    "stream_ewma_eq" -> scoped(streamEwmaEq),
    "stream_type_hist_eq" -> scoped(streamTypeHistEq),
    "stream_recent3_eq" -> scoped(streamRecent3Eq),
    "stream_join_eq" -> scoped(streamJoinEq),
    "stream_left_join_eq" -> scoped(streamLeftJoinEq),
    "stream_quarantine_eq" -> scoped(streamQuarantineEq),
    "stream_bpe_encode_eq" -> scoped(streamBpeEncodeEq),
    "stream_quality_gate_eq" -> scoped(streamQualityGateEq),
    "stream_dsir_weights_eq" -> scoped(streamDsirWeightsEq),
    "stream_decontaminate_eq" -> scoped(streamDecontaminateEq),
    "stream_bm25_refresh_eq" -> scoped(streamBm25RefreshEq),
    "stream_chunk_retrieval_eq" -> scoped(streamChunkRetrievalEq),
    "stream_hybrid_rrf_eq" -> scoped(streamHybridRrfEq),
    "stream_substring_dedup_eq" -> scoped(streamSubstringDedupEq),
    "stream_setsim_dedup_eq" -> scoped(streamSetsimDedupEq),
  )

  // Oracles are the batch twins' SQL (graft.operators.Analytics): streaming
  // and batch must produce the same answer over the same finite input.
  val oracle: Map[String, String] = Map(
    // streaming ingest twin: IDENTICAL oracle to batch ivf_incremental —
    // micro-batched appends must land exactly where a rebuild under the
    // same centroids would put every vector
    "stream_ivf_ingest_eq" -> graft.operators.Similarity.oracle("ivf_incremental"),
    // identical to batch bpe_encode: per-doc fertility under the SAME
    // persisted merge artifact, encoded per micro-batch instead of in
    // one corpus pass
    "stream_bpe_encode_eq" -> graft.operators.TextAnalysis.oracle("bpe_encode"),
    // identical to batch quality_gate: corpus-trained spec (thresholds +
    // tie roster) applied per micro-batch must admit the same doc set
    "stream_quality_gate_eq" -> graft.operators.TextAnalysis.oracle("quality_gate"),
    // identical to batch dsir_weights: per-doc importance weight under
    // the SAME persisted bucket-model artifact, scored per micro-batch
    // by a gram-fold instead of the corpus-wide aggregate dot product
    "stream_dsir_weights_eq" -> graft.operators.Dsir.oracle("dsir_weights"),
    // identical to batch decontaminate_bloom: per-doc screen-then-verify
    // against the persisted benchmark-gram artifact, applied per
    // micro-batch instead of in one corpus join
    "stream_decontaminate_eq" -> graft.operators.Dedup.oracle("decontaminate_bloom"),
    // identical to batch bm25_model_refresh: per-trigger mergeable-model
    // folds must land on the exact full-retrain model
    "stream_bm25_refresh_eq" -> graft.operators.TextAnalysis.oracle("bm25_model_refresh"),
    // identical to batch chunk_retrieval: query panels answered per
    // micro-batch from the persisted postings + BM25 model artifacts
    // must produce the exact batch ranking
    "stream_chunk_retrieval_eq" -> graft.operators.TextAnalysis.oracle("chunk_retrieval"),
    // identical to batch hybrid_rrf_ivf: per-batch serving from the
    // persisted IVF index + BM25 model + lexical postings must land on
    // the exact batch fusion
    "stream_hybrid_rrf_eq" -> graft.operators.Similarity.oracle("hybrid_rrf_ivf"),
    // identical to batch dedup_setsim_incr: pairwise output, each
    // qualifying pair emitted exactly once with trigger-independent
    // values, so the accumulated stream union IS the batch screen
    "stream_setsim_dedup_eq" -> graft.operators.Dedup.oracle("dedup_setsim_incr"),
    // trigger-aware duplicated-span coverage: recurrence = resident
    // corpus, or an arrival whose ntile(5) trigger is <= the doc's own
    // (the stream can only know arrivals up to the current trigger)
    "stream_substring_dedup_eq" ->
      ("WITH d AS (SELECT doc_id, text, len(text) AS total_chars FROM documents WHERE len(text) >= 40), " +
        "p AS (SELECT doc_id, text, unnest(generate_series(1, total_chars - 39)) AS i FROM d), " +
        "ph AS (SELECT doc_id, i, CAST('0x' || substr(md5(substr(text, CAST(i AS INT), 40)), 1, 14) AS BIGINT) AS h FROM p), " +
        "at AS (SELECT doc_id, ntile(5) OVER (ORDER BY doc_id) AS trg FROM documents WHERE doc_id % 10 = 0), " +
        "arr AS (SELECT ph.doc_id, ph.i, ph.h, at.trg FROM ph JOIN at ON ph.doc_id = at.doc_id), " +
        "res AS (SELECT DISTINCT h FROM ph WHERE doc_id % 10 <> 0), " +
        "dp AS (SELECT DISTINCT a.doc_id, a.i FROM arr a WHERE " +
        "EXISTS (SELECT 1 FROM res r WHERE r.h = a.h) OR " +
        "EXISTS (SELECT 1 FROM arr b WHERE b.h = a.h AND b.doc_id <> a.doc_id AND b.trg <= a.trg)), " +
        "fl AS (SELECT doc_id, i, max(i + 39) OVER (PARTITION BY doc_id ORDER BY i " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM dp), " +
        "isl AS (SELECT doc_id, i, sum(CASE WHEN pe IS NULL OR i > pe THEN 1 ELSE 0 END) " +
        "OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM fl), " +
        "sp AS (SELECT doc_id, island, min(i) AS s, max(i + 39) AS e FROM isl GROUP BY 1, 2), " +
        "ag AS (SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS dup_chars FROM sp GROUP BY 1) " +
        "SELECT d.doc_id, CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans, " +
        "CAST(coalesce(a.dup_chars, 0) AS BIGINT) AS dup_chars, " +
        "CAST(d.total_chars AS BIGINT) AS total_chars, " +
        "(1000000 * CAST(coalesce(a.dup_chars, 0) AS BIGINT)) // CAST(d.total_chars AS BIGINT) AS coverage_ppm " +
        "FROM d LEFT JOIN ag a USING (doc_id) WHERE d.doc_id % 10 = 0 ORDER BY doc_id"),
    // identical to batch session_attribution: per-purchase first/last
    // touch decided by streaming state must equal the window derivation
    "stream_attribution_eq" -> graft.operators.Analytics.oracle("session_attribution"),
    // identical to batch cdc_apply: the target snapshot recomputed
    // independently — streaming MERGE must land on the same table
    "stream_cdc_eq" ->
      ("""SELECT o_orderkey, CAST(CASE WHEN o_orderkey % 89 = 0
         |    THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DECIMAL(21,3))
         |    ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(21,3)) END AS VARCHAR) AS v
         |FROM orders WHERE o_orderkey % 97 <> 0 ORDER BY o_orderkey""".stripMargin),
    "stream_quarantine_eq" ->
      ("SELECT CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang, " +
        "count(*) AS n, " +
        "CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined, " +
        "CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE doc_id END) AS BIGINT) AS sum_ids " +
        "FROM documents GROUP BY 1 ORDER BY lang NULLS FIRST"),
    // warm-start twin: backfill(first half) + stream(second half) must
    // equal batch over everything - same oracle as the other latest twins
    "stream_latest_warm_eq" ->
      ("SELECT user_id, last_us, last_event_id, last_type, n_events FROM " +
        "(SELECT user_id, epoch_us(ts) AS last_us, event_id AS last_event_id, " +
        "event_type AS last_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn, " +
        "count(*) OVER (PARTITION BY user_id) AS n_events FROM events) " +
        "WHERE rn = 1 ORDER BY user_id"),
    // transformWithState twin: same fold, same oracle as stream_latest_eq
    "stream_latest_tws_eq" ->
      ("SELECT user_id, last_us, last_event_id, last_type, n_events FROM " +
        "(SELECT user_id, epoch_us(ts) AS last_us, event_id AS last_event_id, " +
        "event_type AS last_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn, " +
        "count(*) OVER (PARTITION BY user_id) AS n_events FROM events) " +
        "WHERE rn = 1 ORDER BY user_id"),
    "stream_latest_eq" ->
      ("SELECT user_id, last_us, last_event_id, last_type, n_events FROM " +
        "(SELECT user_id, epoch_us(ts) AS last_us, event_id AS last_event_id, " +
        "event_type AS last_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn, " +
        "count(*) OVER (PARTITION BY user_id) AS n_events FROM events) " +
        "WHERE rn = 1 ORDER BY user_id"),
    "stream_hourly_eq" ->
      ("SELECT date_trunc('hour', ts) AS hour, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "stream_foreachbatch_eq" ->
      ("SELECT date_trunc('hour', ts) AS hour, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "stream_incremental_eq" ->
      ("SELECT date_trunc('hour', ts) AS hour, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "stream_file_sink_eq" ->
      ("SELECT date_trunc('hour', ts) AS hour, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "stream_dedup_eq" ->
      "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
    "stream_enrich_eq" ->
      ("SELECT e.event_id, e.user_id, n.n_name FROM events e " +
        "JOIN nation n ON e.user_id % 25 = n.n_nationkey ORDER BY e.event_id"),
    "stream_dedup_incr_eq" ->
      "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
    // ListState recency buffer: batch top-3 window, -1 pads young keys
    "stream_recent3_eq" ->
      ("WITH ranked AS (SELECT user_id, event_id, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn, " +
        "count(*) OVER (PARTITION BY user_id) AS n_seen FROM events) " +
        "SELECT user_id, n_seen, " +
        "coalesce(max(CASE WHEN rn = 1 THEN event_id END), -1) AS e1, " +
        "coalesce(max(CASE WHEN rn = 2 THEN event_id END), -1) AS e2, " +
        "coalesce(max(CASE WHEN rn = 3 THEN event_id END), -1) AS e3 " +
        "FROM ranked GROUP BY user_id, n_seen ORDER BY user_id"),
    // MapState histogram: plain batch GROUP BY
    "stream_type_hist_eq" ->
      ("SELECT user_id, event_type, count(*) AS n FROM events " +
        "GROUP BY 1, 2 ORDER BY user_id, event_type"),
    // sequential-state EWMA: same SQL as batch ewma_hourly
    "stream_ewma_eq" ->
      ("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour_ts, count(*) AS cnt, " +
        "epoch_us(date_trunc('hour', ts)) // 3600000000 AS h FROM events GROUP BY 1, 2) " +
        "SELECT a.event_type, a.hour_ts, a.cnt, " +
        "round(sum(b.cnt * pow(0.5, a.h - b.h)) / sum(pow(0.5, a.h - b.h)), 6) AS ewma " +
        "FROM hourly a JOIN hourly b ON a.event_type = b.event_type " +
        "AND b.h BETWEEN a.h - 6 AND a.h " +
        "GROUP BY a.event_type, a.hour_ts, a.cnt ORDER BY a.event_type, a.hour_ts"),
    // bounded-state dedup: key includes the hour bucket, so
    // within-watermark suppression is exhaustive and the result is the
    // plain batch DISTINCT over the bucketed key
    "stream_dedup_wm_eq" ->
      ("SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hour " +
        "FROM events ORDER BY user_id, event_type, hour"),
    // µs-domain comparisons: Spark truncates the ns parquet timestamps to
    // µs on read, so the oracle joins on epoch_us, not raw ns timestamps
    "stream_join_eq" ->
      ("SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id, " +
        "CAST(floor((epoch_us(p.ts) - epoch_us(v.ts)) / 1000000) AS BIGINT) AS gap_s " +
        "FROM events v JOIN events p ON p.user_id = v.user_id " +
        "AND v.event_type = 'view' AND p.event_type = 'purchase' " +
        "AND epoch_us(p.ts) >= epoch_us(v.ts) " +
        "AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000 " +
        "ORDER BY v.user_id, view_id, purchase_id"),
    "stream_left_join_eq" ->
      ("SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id, " +
        "CAST(floor((epoch_us(p.ts) - epoch_us(v.ts)) / 1000000) AS BIGINT) AS gap_s " +
        "FROM (SELECT * FROM events WHERE event_type = 'view') v " +
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ON p.user_id = v.user_id " +
        "AND epoch_us(p.ts) >= epoch_us(v.ts) " +
        "AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000 " +
        "ORDER BY v.user_id, view_id, purchase_id"),
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
    // transformWithState sessionizer (event-time timers): same sessions,
    // same oracle as stream_sessionize_eq
    "stream_sessionize_tws_eq" ->
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
    // native session_window twin: same sessions, same oracle as
    // stream_sessionize_eq (one oracle, three implementations)
    "stream_session_window_eq" ->
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
    "stream_sessionize_incr_eq" ->
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
