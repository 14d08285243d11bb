package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, EventAnalytics}

/** Specs for the round-6 analytics additions (mode, unpivot, EWMA). */
class AnalyticsSpec2 extends SparkSpec {
  import spark.implicits._

  test("mode_agg breaks count ties to the lexicographically smallest type") {
    val m = Analytics.modeAgg(spark, sf)
      .as[(Long, String, Long)].collect()
      .map { case (u, t, n) => u -> (t, n) }.toMap
    // recompute per-user counts scalar-side and check every user
    val counts = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id", "event_type").count()
      .as[(Long, String, Long)].collect()
      .groupBy(_._1)
    assert(m.keySet === counts.keySet)
    counts.foreach { case (u, rows) =>
      val best = rows.map { case (_, t, n) => (t, n) }
        .minBy { case (t, n) => (-n, t) }
      assert(m(u) === best, s"user $u")
    }
  }

  test("ewma equals the hourly count when a type has no prior hours in range") {
    val df = EventAnalytics.ewmaHourly(spark, sf)
    val firsts = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("hour_ts")))
      .filter($"rn" === 1)
      .select($"cnt".cast("double"), $"ewma").as[(Double, Double)].collect()
    firsts.foreach { case (cnt, ewma) => assert(ewma === cnt) }
  }

  test("ewma is a strict convex combination of in-window hourly counts") {
    val bad = EventAnalytics.ewmaHourly(spark, sf)
      .join(EventAnalytics.ewmaHourly(spark, sf)
        .groupBy("event_type").agg(min("cnt").as("lo"), max("cnt").as("hi")), "event_type")
      .filter($"ewma" < $"lo" - 1e-6 || $"ewma" > $"hi" + 1e-6)
      .count()
    assert(bad === 0L)
  }

  test("session_attribution: one row per purchase; touches verified by driver replay") {
    val rows = graft.operators.Analytics.sessionAttribution(spark, sf)
      .as[(Long, Long, Long, Long, String, Option[Long], Option[String])].collect()
    val purchases = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(rows.length == purchases, "every purchase must be attributed exactly once")
    rows.foreach { case (u, s, p, ftId, ftType, ltId, ltType) =>
      assert(ftType.nonEmpty, s"purchase $p: missing first touch")
      assert(ltId.isDefined == ltType.isDefined, s"purchase $p: torn last touch")
      // a session-opening purchase is its own first touch and has no last touch
      if (ltId.isEmpty) assert(ftId == p, s"purchase $p: direct conversion but first touch $ftId")
    }
    // replay one user's event stream on the driver and re-derive attribution
    val u = rows.head._1
    val evs = graft.sources.Tables.events(spark, sf)
      .filter($"user_id" === u)
      .select($"event_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, String, Long)].collect().sortBy(e => (e._3, e._1))
    var lastUs = Long.MinValue; var sess = 0L
    var firstId = 0L; var firstType = ""
    var prevId: Option[Long] = None; var prevType: Option[String] = None
    val expect = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, String, Option[Long], Option[String])]()
    evs.foreach { case (id, tpe, us) =>
      val isNew = lastUs == Long.MinValue || us - lastUs > 30L * 60 * 1000000
      if (isNew) { sess += 1; firstId = id; firstType = tpe }
      val (lt, ltt) = if (isNew) (None, None) else (prevId, prevType)
      if (tpe == "purchase") expect += ((u, sess, id, firstId, firstType, lt, ltt))
      prevId = Some(id); prevType = Some(tpe); lastUs = us
    }
    assert(rows.filter(_._1 == u).toSeq == expect.toSeq, s"user $u attribution replay mismatch")
  }
}
