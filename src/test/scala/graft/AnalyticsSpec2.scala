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
}
