package graft

import graft.operators.{MrQueries, Relational, WordCount}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("semi + anti partition the customer table") {
    val total = graft.sources.Tables.customer(spark, sf).count()
    val semi = Relational.semiJoin(spark, sf).count()
    val anti = Relational.antiJoin(spark, sf).count()
    assert(semi + anti == total)
  }

  test("intersect/except agree with semi/anti on keys") {
    assert(Relational.setIntersect(spark, sf).count() ==
      Relational.semiJoin(spark, sf).count())
    assert(Relational.setExcept(spark, sf).count() ==
      Relational.antiJoin(spark, sf).count())
  }

  test("topk returns 100 rows in descending price order") {
    val prices = Relational.topk(spark, sf)
      .select("l_extendedprice").as[Double].collect()
    assert(prices.length == 100)
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("union_all counts = sum of the two branch counts") {
    val o = graft.sources.Tables.orders(spark, sf)
    val expect = o.filter($"o_totalprice" < 10000).count() +
      o.filter($"o_totalprice" >= 400000).count()
    val got = Relational.unionAll(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(got == expect)
  }

  test("mr facade wordcount == DataFrame wordcount (both paths)") {
    val df = WordCount.wordcount(spark, sf).collect().toSeq
    val mr = MrQueries.mrWordcount(spark, sf).collect().toSeq
    val mrc = MrQueries.mrWordcountCombine(spark, sf).collect().toSeq
    assert(mr == df)
    assert(mrc == df)
  }

  test("map_funcs: map lookup and fold agree with direct aggregates") {
    val rows = Relational.mapFuncs(spark, sf)
      .select($"user_id", $"views", $"total").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getLong(2)))
      .toMap
    val ev = graft.sources.Tables.events(spark, sf)
    val views = ev.filter($"event_type" === "view")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    val totals = ev.groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(rows.nonEmpty)
    rows.foreach { case (u, (v, t)) =>
      assert(t == totals(u), s"user $u total")
      assert(v == views.getOrElse(u, -1L), s"user $u views")
    }
  }
}
