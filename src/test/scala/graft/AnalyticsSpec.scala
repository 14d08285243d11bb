package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics
import graft.sources.Tables

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("q1 groups cover all (returnflag, linestatus) pairs and counts sum to filtered rows") {
    val q1 = Analytics.q1Pricing(spark, sf).cache()
    val n = q1.agg(sum("count_order")).as[Long].head()
    val expect = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" <= to_timestamp(lit("2001-09-01"))).count()
    assert(n == expect)
    q1.unpersist()
  }

  test("q5 revenue covers only ASIA/EUROPE nations") {
    val nations = Analytics.q5RegionRevenue(spark, sf)
      .select("n_name").as[String].collect().toSet
    val allowed = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter($"r_name".isin("ASIA", "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select("n_name").as[String].collect().toSet
    assert(nations.subsetOf(allowed) && nations.nonEmpty)
  }

  test("window_topn keeps at most 3 rows per supplier, rn ascending") {
    val bad = Analytics.windowTopn(spark, sf)
      .groupBy("l_suppkey").agg(count(lit(1)).as("n"), max("rn").as("m"))
      .filter($"n" > 3 || $"m" > 3).count()
    assert(bad == 0)
  }

  test("rollup has grand total row equal to table count") {
    val total = Analytics.rollupAgg(spark, sf)
      .filter($"o_orderstatus".isNull && $"o_orderpriority".isNull)
      .select("n").as[Long].head()
    assert(total == Tables.orders(spark, sf).count())
  }

  test("approx_count_distinct within 5% of exact, exact column matches") {
    val exact = Analytics.distinctUsers(spark, sf)
      .select($"event_type", $"users").as[(String, Long)].collect().toMap
    val rows = Analytics.approxDistinct(spark, sf)
      .select($"event_type", $"exact_users", $"within_5pct")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, e, ok) =>
      assert(e == exact(t), s"type $t: exact_users $e vs ${exact(t)}")
      assert(ok, s"type $t: HLL estimate outside 5% of $e")
    }
  }

  test("sessionize: session event counts sum to total events") {
    val total = Analytics.sessionize(spark, sf).agg(sum("n_events")).as[Long].head()
    assert(total == Tables.events(spark, sf).count())
  }

  test("event_sliding counts are exactly 2x event count in aggregate") {
    val slid = Analytics.eventSliding(spark, sf).agg(sum("n")).as[Long].head()
    assert(slid == 2 * Tables.events(spark, sf).count())
  }

  test("asof_join: every error event appears once; gaps nonnegative or -1") {
    val a = Analytics.asofJoin(spark, sf).cache()
    val errs = Tables.events(spark, sf).filter($"event_type" === "error").count()
    assert(a.count() == errs)
    assert(a.filter($"secs_since_purchase" < -1).count() == 0)
    a.unpersist()
  }

  test("quantiles are monotone: p50 <= p90 <= p99") {
    val bad = Analytics.quantiles(spark, sf)
      .filter($"p50" > $"p90" || $"p90" > $"p99").count()
    assert(bad == 0)
  }

  test("stats_agg variance matches var_samp within fp tolerance") {
    val got = Analytics.statsAgg(spark, sf)
      .select($"l_returnflag", $"variance").as[(String, Double)].collect().toMap
    val ref = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(var_samp($"l_quantity").as("v"))
      .as[(String, Double)].collect().toMap
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-6) }
  }

  test("session_window_agg == window-lag sessionize row for row") {
    val native = Analytics.sessionWindowAgg(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val manual = Analytics.sessionize(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(native.nonEmpty)
    assert(native == manual)
  }

  test("approx_quantile: every group's sketch median is within its rank bound") {
    val rows = Analytics.approxQuantile(spark, sf)
      .select($"l_returnflag", $"within_bound").as[(String, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, ok) => assert(ok, s"group $flag out of bound") }
  }

  test("latest_by_key: last_us is the max event time and counts sum to total") {
    val events = Tables.events(spark, sf)
    val got = graft.operators.EventAnalytics.latestByKey(spark, sf)
    val refMax = events
      .groupBy("user_id").agg(max(unix_micros($"ts")).as("m"))
      .as[(Long, Long)].collect().toMap
    val rows = got.select($"user_id", $"last_us", $"n_events")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == refMax.size)
    rows.foreach { case (u, us, _) => assert(us == refMax(u)) }
    assert(rows.map(_._3).sum == events.count())
  }
}
