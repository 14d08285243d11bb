package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Second TPC-H-style batch — the remaining dress-rehearsal queries,
  * completing all 22 TPC-H plan shapes. The testdata has no partsupp
  * table and no commit/receipt dates, so Q11/Q20/Q21 run on documented
  * proxies (lineitem-derived stock value for partsupp; ship-vs-order
  * lag for receipt-vs-commit lateness) — the join/aggregate/subquery
  * SKELETON of each original is preserved exactly, which is what the
  * planner exercises. Q8/Q9/Q15/Q17/Q19/Q22 are adapted to the
  * available columns as before.
  *
  * Scale posture mirrors Analytics.scala: genuinely-bounded dims
  * (region, nation) are broadcast; part/supplier/customer joins are left
  * unhinted so AQE size-selects broadcast at test SF and SMJ at 100 TB;
  * every money sum is DECIMAL(18,2) pre-cast (exact, order-independent);
  * threshold comparisons against averages are cross-multiplied into
  * exact integer/decimal inequalities (qty·5·cnt < Σqty instead of
  * qty < 0.2·avg) so no float division sits on a filter boundary.
  */
object TpcH2 {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def disc(c: Column): Column = dec(lit(1) - c)

  /** TPC-H Q8-style national market share: within one region's customer
    * market and one part type, the yearly revenue share delivered by one
    * supplier nation. Share is a conditional-sum ratio over the same
    * aggregate pass — one fact pipeline, two dims broadcast, division
    * only AFTER both exact decimal sums are final. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
    val asiaNations = broadcast(nat
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("asia_nationkey")))
    val cust = Tables.customer(spark, dir)
      .join(asiaNations, col("c_nationkey") === col("asia_nationkey"))
      .select("c_custkey")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val pk = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD").select("p_partkey")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(pk, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_1",
          dec(col("l_extendedprice")) * disc(col("l_discount")))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("nat_vol"),
        sum(dec(col("l_extendedprice")) * disc(col("l_discount"))).as("all_vol"))
      .select(col("o_year"),
        round(col("nat_vol").cast("double") / col("all_vol").cast("double"), 6)
          .as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9-style product-type profit: per supplier nation and order
    * year, revenue minus cost for a part-name slice. The testdata has no
    * partsupp, so retail price × quantity stands in for supply cost —
    * same join/aggregate skeleton (5-table join, LIKE-filtered part
    * dim). Profit terms are exact decimal products; the only doubles
    * appear after the final sum. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val pk = Tables.part(spark, dir)
      .filter(col("p_name").like("blue%"))
      .select("p_partkey", "p_retailprice")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
      .join(pk, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(
        dec(col("l_extendedprice")) * disc(col("l_discount")) -
          dec(col("p_retailprice")) * dec(col("l_quantity")))
        .cast("double").as("sum_profit"))
      .orderBy(asc("nation"), desc("o_year"))
  }

  /** TPC-H Q15-style top supplier: revenue per supplier over one
    * quarter, return the max-revenue supplier(s). The max is a one-row
    * aggregate broadcast back against the EXACT decimal revenue (never a
    * double equality), so ties are handled correctly by construction —
    * same decorrelated shape Catalyst gives the view+subquery original. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      .groupBy("l_suppkey")
      .agg(sum(dec(col("l_extendedprice")) * disc(col("l_discount"))).as("rev"))
    val mx = rev.agg(max(col("rev")).as("mx"))
    rev.join(broadcast(mx), col("rev") === col("mx"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17-style small-quantity revenue: average yearly revenue that
    * would vanish if sub-20%-of-average-quantity orders for one brand
    * stopped. The correlated per-part AVG decorrelates into one grouped
    * aggregate joined back to the lines; the 0.2·avg threshold is the
    * cross-multiplied exact inequality 5·cnt·qty < Σqty, so the filter
    * boundary is decimal-exact on both engines. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir)
          .filter(col("p_brand") === "Brand#3").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val stats = li.groupBy("l_partkey")
      .agg(sum(dec(col("l_quantity"))).as("sum_q"), count(lit(1)).as("cnt"))
    li.join(stats, Seq("l_partkey"))
      .filter(dec(col("l_quantity")) * lit(5) * col("cnt") < col("sum_q"))
      .agg(round(sum(dec(col("l_extendedprice"))).cast("double") / 7, 6)
        .as("avg_yearly"))
  }

  /** TPC-H Q19-style disjunctive-predicate revenue: three OR'd
    * (brand, size band, quantity band) branches across the part join.
    * The quantity conjuncts are fact-side and push to the lineitem scan
    * as one OR filter; the branch selection itself must survive the join
    * — the query that catches planners which give up on disjunctions. */
  def q19OrPredicates(spark: SparkSession, dir: String): DataFrame = {
    val branch = (
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
        col("l_quantity").between(20, 30)))
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .filter(branch)
      .agg(count(lit(1)).as("n_lines"),
        round(sum(dec(col("l_extendedprice")) * disc(col("l_discount")))
          .cast("double"), 2).as("revenue"))
  }

  /** TPC-H Q22-style dormant high-balance customers: above the global
    * positive-average balance AND no order in the final year — per
    * segment, how much committed capital sits idle. The global average
    * is a one-row aggregate cross-joined back (broadcast, exact
    * cross-multiplied compare bal·cnt > Σbal); the recency check is a
    * LEFT ANTI join against the date-pruned orders slice. */
  def q22DormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val stats = cust.filter(col("c_acctbal") > 0)
      .agg(sum(dec(col("c_acctbal"))).as("bal_sum"), count(lit(1)).as("bal_cnt"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01")))
      .select("o_custkey")
    cust.crossJoin(broadcast(stats))
      .filter(dec(col("c_acctbal")) * col("bal_cnt") > col("bal_sum"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q11-style important stock: per-part inventory value held by
    * one nation's suppliers, keeping parts whose value exceeds a
    * fraction-of-total threshold. No partsupp table, so value is
    * lineitem-derived (Σ qty·retailprice per part over NATION_1
    * suppliers) — same grouped-agg + global-total scalar-subquery
    * HAVING as the original. The original's `0.0001/SF` fraction is
    * scale-hostile (selects nothing as part count grows), so the
    * threshold is `value > 2 × mean part value`, cross-multiplied to
    * the exact integer/decimal inequality value·n_parts > 2·total —
    * scale-invariant and float-free on the filter boundary. */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val sup1 = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_1")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val byPart = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(sup1, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.part(spark, dir).select("p_partkey", "p_retailprice"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(dec(col("l_quantity")) * dec(col("p_retailprice"))).as("stock_value"))
    val tot = byPart.agg(sum(col("stock_value")).as("total"), count(lit(1)).as("np"))
    byPart.crossJoin(broadcast(tot))
      .filter(col("stock_value") * col("np") > col("total") * lit(2))
      .select(col("partkey"), col("stock_value").cast("double").as("stock_value"))
      .orderBy(desc("stock_value"), asc("partkey"))
  }

  /** TPC-H Q20-style promotion-part suppliers: suppliers holding excess
    * stock of a part-name slice. No partsupp availqty, so availability
    * is the 1995 shipped quantity per (supplier, part) and demand is
    * the 1996 quantity — the original's `availqty > 0.5 · yearly
    * shipped` becomes the exact decimal inequality q95 > 2·q96 over
    * one conditional-sum pass (no second scan). Skeleton preserved:
    * LIKE-filtered part dim → per-(supp,part) correlated aggregate →
    * threshold → DISTINCT supplier semi-join → nation-filtered
    * supplier output. */
  def q20PromotionParts(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").like("red%")).select("p_partkey")
    val qualified = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(
        sum(when(year(col("l_shipdate")) === 1995, dec(col("l_quantity")))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("q95"),
        sum(when(year(col("l_shipdate")) === 1996, dec(col("l_quantity")))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("q96"))
      .filter(col("q95") > col("q96") * lit(2))
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_1")),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_name")
  }

  /** TPC-H Q21-style waiting suppliers: count, per NATION_1 supplier,
    * the finished multi-supplier orders where that supplier was the
    * ONLY late one. No commit/receipt dates, so "late" is shipping
    * more than 90 days after the order date. The original's
    * EXISTS(other supplier) / NOT EXISTS(other late supplier) double
    * self-join is rewritten as ONE per-order aggregate — n_supp ≥ 2
    * ∧ n_late_supp = 1 — which is the shape you want at 100 TB: one
    * shuffle on orderkey instead of two fact-fact self-joins. The
    * DuckDB oracle runs the literal EXISTS form, so the rewrite's
    * equivalence is itself oracle-gated. Counts l1 LINES (not
    * distinct orders), matching the original's COUNT(*). */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
    val perOrder = lines.groupBy(col("l_orderkey").as("ok"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
    lines.filter(col("late"))
      .join(perOrder, col("l_orderkey") === col("ok"))
      .join(Tables.supplier(spark, dir)
          .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_1")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q8_market_share" -> q8MarketShare,
    "q11_important_stock" -> q11ImportantStock,
    "q20_promotion_parts" -> q20PromotionParts,
    "q21_waiting_suppliers" -> q21WaitingSuppliers,
    "q9_product_profit" -> q9ProductProfit,
    "q15_top_supplier" -> q15TopSupplier,
    "q17_small_qty_revenue" -> q17SmallQtyRevenue,
    "q19_or_predicates" -> q19OrPredicates,
    "q22_dormant_customers" -> q22DormantCustomers,
  )

  val oracle: Map[String, String] = Map(
    "q11_important_stock" ->
      ("WITH s1 AS (SELECT s_suppkey FROM supplier JOIN nation " +
        "ON s_nationkey = n_nationkey AND n_name = 'NATION_1'), " +
        "v AS (SELECT l_partkey AS partkey, " +
        "sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))) AS sv " +
        "FROM lineitem JOIN s1 ON l_suppkey = s_suppkey " +
        "JOIN part ON l_partkey = p_partkey GROUP BY l_partkey), " +
        "t AS (SELECT sum(sv) AS total, count(*) AS np FROM v) " +
        "SELECT partkey, CAST(sv AS DOUBLE) AS stock_value FROM v, t " +
        "WHERE sv * np > 2 * total ORDER BY stock_value DESC, partkey"),
    "q20_promotion_parts" ->
      ("WITH q AS (SELECT l_suppkey FROM lineitem " +
        "JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%' " +
        "GROUP BY l_suppkey, l_partkey " +
        "HAVING sum(CASE WHEN year(l_shipdate) = 1995 THEN CAST(l_quantity AS DECIMAL(18,2)) " +
        "ELSE CAST(0 AS DECIMAL(18,2)) END) > " +
        "2 * sum(CASE WHEN year(l_shipdate) = 1996 THEN CAST(l_quantity AS DECIMAL(18,2)) " +
        "ELSE CAST(0 AS DECIMAL(18,2)) END)) " +
        "SELECT s_suppkey, s_name FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1' " +
        "WHERE s_suppkey IN (SELECT l_suppkey FROM q) ORDER BY s_name"),
    "q21_waiting_suppliers" ->
      ("WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F') " +
        "SELECT s_name, count(*) AS numwait FROM l l1 " +
        "JOIN supplier ON l1.l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1' " +
        "WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 90 DAY " +
        "AND EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey " +
        "AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.l_orderkey = l1.l_orderkey " +
        "AND l3.l_suppkey <> l1.l_suppkey " +
        "AND l3.l_shipdate > l3.o_orderdate + INTERVAL 90 DAY) " +
        "GROUP BY s_name ORDER BY numwait DESC, s_name"),
    "q8_market_share" ->
      ("WITH vol AS (SELECT CAST(year(o_orderdate) AS INT) AS o_year, n2.n_name AS supp_nation, " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS v " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD' " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
        "JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA' " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey) " +
        "SELECT o_year, round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN v ELSE 0 END) AS DOUBLE) " +
        "/ CAST(sum(v) AS DOUBLE), 6) AS mkt_share FROM vol GROUP BY o_year ORDER BY o_year"),
    "q9_product_profit" ->
      ("SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) " +
        "- CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey AND p_name LIKE 'blue%' " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1, 2 ORDER BY 1 ASC, 2 DESC"),
    "q15_top_supplier" ->
      ("WITH rev AS (SELECT l_suppkey, " +
        "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS r " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) " +
        "SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue " +
        "FROM rev JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE r = (SELECT max(r) FROM rev) ORDER BY s_suppkey"),
    "q17_small_qty_revenue" ->
      ("WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice FROM lineitem " +
        "JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#3'), " +
        "st AS (SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_q, " +
        "count(*) AS cnt FROM li GROUP BY l_partkey) " +
        "SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7, 6) AS avg_yearly " +
        "FROM li JOIN st ON l_partkey = pk " +
        "WHERE 5 * cnt * CAST(l_quantity AS DECIMAL(18,2)) < sum_q"),
    "q19_or_predicates" ->
      ("SELECT count(*) AS n_lines, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11) " +
        "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20) " +
        "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)"),
    "q22_dormant_customers" ->
      ("WITH s AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum, count(*) AS bal_cnt " +
        "FROM customer WHERE c_acctbal > 0) " +
        "SELECT c_mktsegment, count(*) AS numcust, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal " +
        "FROM customer, s " +
        "WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_cnt > bal_sum " +
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderdate >= TIMESTAMP '2001-01-01') " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
  )
}
