package graft

import org.apache.spark.sql.functions._

import graft.operators.TpcH2
import graft.sources.Tables

class TpcH2Spec extends SparkSpec {
  import spark.implicits._

  test("q8: every yearly market share sits in [0, 1]") {
    val shares = TpcH2.q8MarketShare(spark, sf).as[(Int, Double)].collect()
    assert(shares.nonEmpty)
    shares.foreach { case (_, s) => assert(s >= 0.0 && s <= 1.0) }
  }

  test("q15: every returned supplier carries the identical (max) revenue") {
    val rows = TpcH2.q15TopSupplier(spark, sf)
      .select("total_revenue").as[Double].collect()
    assert(rows.nonEmpty)
    assert(rows.toSet.size == 1)
  }

  test("q17: admitted lines are strictly below 20% of their part average") {
    // Re-derive the threshold independently (float avg, strict side) and
    // check the exact-decimal filter admitted no line at/above it.
    val li = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf)
          .filter($"p_brand" === "Brand#3").select("p_partkey"),
        $"l_partkey" === $"p_partkey")
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val avgQ = li.groupBy("l_partkey").agg(avg("l_quantity").as("avg_q"),
      count(lit(1)).as("cnt"), sum($"l_quantity".cast("decimal(18,2)")).as("sum_q"))
    val admitted = li.join(avgQ, "l_partkey")
      .filter($"l_quantity".cast("decimal(18,2)") * lit(5) * $"cnt" < $"sum_q")
    val violations = admitted.filter($"l_quantity" >= lit(0.2) * $"avg_q" + 1e-9).count()
    assert(violations == 0)
    val expected = admitted
      .agg(round(sum($"l_extendedprice".cast("decimal(18,2)")).cast("double") / 7, 6))
      .as[Double].head()
    val got = TpcH2.q17SmallQtyRevenue(spark, sf).as[Double].head()
    assert(got == expected)
  }

  test("q19: revenue equals the sum of the three branches computed separately") {
    def branchRev(brand: String, sizeHi: Int, qLo: Int, qHi: Int): java.math.BigDecimal =
      Tables.lineitem(spark, sf)
        .join(Tables.part(spark, sf), $"l_partkey" === $"p_partkey")
        .filter($"p_brand" === brand && $"p_size".between(1, sizeHi) &&
          $"l_quantity".between(qLo, qHi))
        .agg(coalesce(sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1) - $"l_discount").cast("decimal(18,2)")), lit(0).cast("decimal(38,4)")))
        .as[java.math.BigDecimal].head()
    val parts = branchRev("Brand#1", 10, 1, 11)
      .add(branchRev("Brand#2", 20, 10, 20))
      .add(branchRev("Brand#3", 30, 20, 30))
    val got = TpcH2.q19OrPredicates(spark, sf).select("revenue").as[Double].head()
    assert(got == parts.setScale(2, java.math.RoundingMode.HALF_UP).doubleValue())
  }

  test("q22: no dormant customer has a recent order or a below-average balance") {
    val dormantTotal = TpcH2.q22DormantCustomers(spark, sf)
      .agg(sum("numcust")).as[Long].head()
    val cust = Tables.customer(spark, sf)
    val posAvg = cust.filter($"c_acctbal" > 0).agg(avg("c_acctbal")).as[Double].head()
    val recentKeys = Tables.orders(spark, sf)
      .filter($"o_orderdate" >= to_timestamp(lit("2001-01-01")))
      .select($"o_custkey").distinct()
    val expected = cust.filter($"c_acctbal" > posAvg)
      .join(recentKeys, $"c_custkey" === $"o_custkey", "left_anti")
      .count()
    assert(dormantTotal == expected)
  }

  test("q9: profit decomposes as revenue minus proxy cost per nation-year") {
    val profit = TpcH2.q9ProductProfit(spark, sf)
    assert(profit.count() > 0)
    // spot-invariant: total profit over all groups equals the ungrouped total
    val total = profit.agg(round(sum("sum_profit"), 4)).as[Double].head()
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter($"p_name".like("blue%"))
        .select("p_partkey", "p_retailprice"), $"l_partkey" === $"p_partkey")
      .agg(round(sum(
        $"l_extendedprice".cast("decimal(18,2)") * (lit(1) - $"l_discount").cast("decimal(18,2)") -
          $"p_retailprice".cast("decimal(18,2)") * $"l_quantity".cast("decimal(18,2)"))
        .cast("double"), 4)).as[Double].head()
    assert(total == direct)
  }
}
