package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Multimodal}
import graft.sources.Tables
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def loadEvents(): Seq[Event] =
    Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq

  test("streaming hourly counts == batch event_hourly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.hourlyCounts(mem.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try {
      mem.addData(loadEvents(): _*)
      q.processAllAvailable()
      val got = spark.table("hourly_out")
        .orderBy("hour")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      val want = Analytics.eventHourly(spark, sf)
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("file-sink hourly roundtrip == batch event_hourly (exactly-once read-back)") {
    val got = graft.streaming.StreamingBridge.streamFileSinkEq(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    val want = Analytics.eventHourly(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("streaming sessionize totals == batch sessionize (closed sessions)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.sessionize(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      val evs = loadEvents().sortBy(e => (e.ts.getTime, e.event_id))
      mem.addData(evs: _*)
      q.processAllAvailable()
      // push watermark far past the last event so every session closes
      val last = evs.last
      mem.addData(Event(9999999L,
        new java.sql.Timestamp(last.ts.getTime + 24L * 3600 * 1000),
        -1L, "flush", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .filter($"user_id" >= 0)
        .groupBy("user_id").agg(sum("n_events").as("total"))
        .as[(Long, Long)].collect().toMap
      val want = Analytics.sessionize(spark, sf)
        .groupBy("user_id").agg(sum("n_events").as("total"))
        .as[(Long, Long)].collect().toMap
      assert(got == want)
    } finally q.stop()
  }

  test("stream-stream join == batch interval self-join (views x purchases)") {
    val got = graft.streaming.StreamingBridge.streamJoinEq(spark, sf)
      .select($"user_id", $"view_id", $"purchase_id", $"gap_s")
      .as[(Long, Long, Long, Long)].collect().toSet
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
    val v = ev.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"us".as("vus"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"event_id".as("purchase_id"), $"us".as("pus"))
    val want = v.join(p, $"user_id" === $"pu" &&
        $"pus" >= $"vus" && $"pus" <= $"vus" + 3600000000L)
      .select($"user_id", $"view_id", $"purchase_id",
        floor(($"pus" - $"vus") / 1000000L).as("gap_s"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("multimodal decode stub is deterministic and matches byte math") {
    val (w, h, c) = Multimodal.decodeStub("the fast".getBytes("UTF-8"))
    assert(w == 64 + 't'.toInt % 64 && h == 64 + 'h'.toInt % 64 && c == 3)
    val empty = Multimodal.decodeStub(Array.emptyByteArray)
    assert(empty == (64, 64, 3))
  }

  test("media_features vectors are 16-dim and sum to ~1") {
    val rows = Multimodal.mediaFeatures(spark, sf)
      .select($"doc_id", $"features").as[(Long, Seq[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, v) =>
      assert(v.length == 16, s"doc $id: dim ${v.length}")
      // per-bin rounding to 6 decimals can drift the sum by ≤ 16 * 5e-7
      assert(math.abs(v.sum - 1.0) < 1e-4, s"doc $id: sum ${v.sum}")
    }
  }

  test("frame_sample frames are 16-byte slices at 64-byte stride") {
    val fs = Multimodal.frameSample(spark, sf)
    val one = fs.filter($"doc_id" === 0).collect()
    val text = Tables.documents(spark, sf)
      .filter($"doc_id" === 0).select("text").as[String].head()
    val expected = (0 to (text.length - 16) / 64).map { i =>
      val slice = text.substring(i * 64, i * 64 + 16)
      java.security.MessageDigest.getInstance("MD5")
        .digest(slice.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    assert(one.map(_.getString(2)).toSeq == expected)
  }
}
