package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Grouped analytics, joins, windows, and event-time queries over the
  * star schema — the capability categories the reference lacks entirely
  * (SURVEY.md §2.3: joins/aggregations/windows/sorts ABSENT in
  * /root/reference; only COUNT(*)-per-key exists, src/mr/function.rs:18-20).
  *
  * Scale posture:
  *  - Dimension tables (region, nation) are `broadcast()` — no shuffle of
  *    the fact table for dim joins at any SF.
  *  - Fact-fact joins (orders ⋈ lineitem) shuffle on the join key and are
  *    left to AQE (on by default in Spark 4) for runtime coalescing / skew
  *    splitting.
  *  - Aggregates use DECIMAL(18,2) sums (exact, order-independent) and
  *    derive averages as exact-decimal-sum ÷ count cast through double —
  *    deterministic on both engines, never a float-accumulation race.
  */
object Analytics {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary: the canonical partial+final
    * HashAggregate over the biggest table, 4 aggregate shapes. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: segment customers ⋈ orders ⋈ lineitem, top-10 open
    * orders by revenue. Customer side collapses to keys before the join. */
  def q3Revenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // no broadcast() hint on customer: it scales with SF (unlike
    // region/nation), so size-based selection — AQE at runtime — must
    // decide; a forced broadcast would OOM a 1000-executor job at 100 TB
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem,
    * revenue by nation. region+nation broadcast (tiny dims); the
    * orders⋈lineitem fact join shuffles on the order key. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name").isin("ASIA", "EUROPE"))),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** LEFT OUTER join: every customer with their order count and spend —
    * null-extension observable as count(o_orderkey)=0 for order-less
    * customers. Same AQE-decided shuffle join shape as q3 (both sides
    * scale with SF, so no forced broadcast). */
  def leftOuterJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select("c_custkey", "c_name")
      .join(Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderkey"), dec(col("o_totalprice")).as("p")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("p")).cast("double"), lit(0.0)).as("total_spend"))
      .orderBy("c_custkey")

  /** FULL OUTER join: high-balance customers vs big-order counts — rows
    * survive from either side alone (acctbal NULL on right-only rows,
    * n_big 0 on left-only). Keys coalesce to one output column. */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val rich = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("ck"), col("c_acctbal").as("acctbal"))
    val big = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000)
      .groupBy(col("o_custkey").as("ok"))
      .agg(count(lit(1)).as("nb"))
    rich.join(big, col("ck") === col("ok"), "full_outer")
      .select(coalesce(col("ck"), col("ok")).as("custkey"), col("acctbal"),
        coalesce(col("nb"), lit(0L)).as("n_big"))
      .orderBy("custkey")
  }

  /** RIGHT OUTER join (completing the family with left/full): every part
    * with its lineitem count — parts never ordered survive with count 0.
    * The preserved side is the smaller one; at scale AQE picks the build
    * side, unhinted. */
  def rightOuterJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select("l_partkey", "l_orderkey")
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"), "right_outer")
      .groupBy("p_partkey", "p_brand")
      .agg(count(col("l_orderkey")).as("n_items"))
      .orderBy("p_partkey")

  /** TPC-H Q2-style min-cost supplier: for each part, the supplier with
    * the lowest observed price (correlated min via window rank — one
    * shuffle on l_partkey after a partial-aggregated groupBy, never a
    * correlated re-scan per part). part/supplier joins are key-only until
    * the final name projection; both scale with SF so AQE picks the
    * strategy. Covers the two otherwise-unqueried dimension tables. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val costs = Tables.lineitem(spark, dir)
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(dec(col("l_extendedprice"))).as("min_price"))
    val w = Window.partitionBy("l_partkey").orderBy(asc("min_price"), asc("l_suppkey"))
    costs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(Tables.part(spark, dir).select("p_partkey", "p_name"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("min_price").cast("double").as("min_price"))
      .orderBy("p_partkey")
  }

  /** Ranking-distribution windows — ntile quartiles, percent_rank,
    * cume_dist per event type, the per-group score-normalization pass a
    * feature pipeline runs (e.g. percentile features for a ranker).
    * Unique (value, event_id) ordering makes all three deterministic
    * across engines; one shuffle on the group key, in-partition sort. */
  def windowNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy("event_id")
  }

  /** Ranking window: top-3 line items per supplier by price.
    * At scale this is one shuffle on l_suppkey + an in-partition sort —
    * no global sort, no driver materialization. */
  def windowTopn(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
    Tables.lineitem(spark, dir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("l_suppkey", "rn")
  }

  /** Running-total window: cumulative spend per customer over order date. */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        dec(col("o_totalprice")).as("p"))
      .withColumn("running_spend", sum(col("p")).over(w).cast("double"))
      .drop("p")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** ROLLUP grouping sets with explicit NULLS FIRST ordering (Spark's
    * default ascending order) so both engines agree on row order. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** CUBE over two lineitem dimensions. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Exact + grouped distinct counting. */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Approximate distinct (HLL). The sketch value itself is
    * engine-specific (no cross-engine parity possible), so the
    * oracle-checkable shape is the error BOUND: Spark emits the exact
    * count plus `within_5pct` = |approx − exact|/exact ≤ 0.05, and the
    * DuckDB oracle emits the exact count with a literal TRUE — the row
    * hash-matches iff the sketch really is within bound. The sketch is
    * sized at rsd = 0.01 so the 5% gate sits at 5σ — the default 0.05
    * makes 5% a 1σ bound that a third of groups would breach (observed:
    * one group at sf0.1); a production bound must be slack against the
    * sketch's own precision, not equal to it. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    // The sketch and the exact count are SEPARATE aggregations joined on
    // the bounded group key (r21, guide §2.3): mixing countDistinct with
    // approx_count_distinct in one agg makes Spark's single-distinct
    // rewrite key the partial aggregate by (event_type, user_id) — the
    // rsd=0.01 HLL++ sketch (1,638 longs ≈ 13 KB) is then materialized
    // and SHUFFLED per DISTINCT USER, not per event_type (measured at
    // sf0.01: 1,641-column partial rows into the exchange, ~6 s pass-1
    // for a ~30-row result; at 100 TB that is |users|·13 KB of pure
    // overhead). Split, the sketch pass is a plain partial+final agg
    // with ~|event_type| sketches total, the exact pass shuffles bare
    // (event_type, user_id) pairs, and the join is a broadcast of the
    // bounded group-key table. HLL++ register maxima are merge-order-
    // independent, so the estimate — and the row hash — is unchanged.
    val ev = Tables.events(spark, dir)
    val approx = ev.groupBy(col("event_type").as("a_event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"))
    // Null-safe join key (r21 ADVICE): both sides group the SAME column of
    // the same table, so a NULL event_type group — none exist today, but
    // the single-agg formulation this replaced kept it — must survive the
    // split exactly as the oracle's GROUP BY keeps it. `<=>` is a valid
    // hash-join key, so the plan stays a BroadcastHashJoin.
    ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .join(broadcast(approx), col("event_type") <=> col("a_event_type"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") /
          col("exact_users") <= 0.05).as("within_5pct"))
      .orderBy("event_type")
  }

  /** Mergeable-sketch rollup: one HLL (Datasketches) per (event_type,
    * day) partial, unioned per event_type and estimated — the pattern
    * that makes distinct-count rollups O(sketch) instead of O(re-scan)
    * at 100 TB: daily partials are built once at ingest, and any
    * time-range distinct query is a union of ≤365 sketches per key,
    * never a second pass over the events. The sketch value is
    * engine-specific, so the oracle gates the HLL's published error
    * bound (approx_distinct pattern): exact side + `within_5pct`
    * literal-true hash-matches iff the merged estimate honors ±5% (lgK
    * 12 ⇒ ~1.6% RSE, 3σ inside the gate). */
  def hllDailyMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val merged = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    merged
      .join(ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("exact_users")),
        "event_type")
      .select(col("event_type"), col("n_days"), col("exact_users"),
        (abs(col("est") - col("exact_users")).cast("double") /
          col("exact_users") <= 0.05).as("within_5pct"))
      .orderBy("event_type")
  }

  /** Sketch SET ALGEBRA: day-over-day retained distinct users via theta
    * sketches — the operation HLL cannot do (HLL unions only; theta
    * supports intersection/difference). One theta sketch per day built
    * map-side, then each consecutive-day pair intersects two SKETCHES —
    * at 100 TB the (day, user) self-join this replaces is a full
    * distinct-pairs shuffle, while the sketch path ships one ~32 KB
    * summary per day. Gate: theta's intersection estimate is exact
    * while both sketches are in exact mode (≤4096 retained hashes) and
    * bounded otherwise; the oracle emits the exact retained count +
    * literal true, hash-matching iff the estimate lands within ±5%. */
  def thetaOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val du = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val daily = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(theta_sketch_agg(col("user_id")).as("sk"))
    val est = daily.as("d1")
      .join(daily.as("d2"), expr("d2.day = date_add(d1.day, 1)"))
      .select(col("d1.day").as("day"),
        theta_sketch_estimate(theta_intersection(col("d1.sk"), col("d2.sk"))).as("est"))
    val exact = du.as("a")
      .join(du.as("b"),
        col("a.user_id") === col("b.user_id") && expr("b.day = date_add(a.day, 1)"))
      .groupBy(col("a.day").as("day")).agg(count(lit(1)).as("exact_retained"))
    est.join(exact, "day")
      .select(col("day"), col("exact_retained"),
        (abs(col("est") - col("exact_retained")).cast("double") /
          col("exact_retained") <= 0.05).as("within_5pct"))
      .orderBy("day")
  }

  /** Count-min sketch point-frequency estimates — the last member of the
    * mergeable-sketch family (HLL unions, theta intersections, rank
    * sketch, bloom membership, Misra-Gries heavy hitters, CMS point
    * queries). Build is fully distributed (partial sketches merged in
    * the final aggregate — the same ingest-time-partials architecture as
    * hll_daily_merge); one ~KB array crosses to the driver and answers
    * any point query without re-scanning. Gate: CMS never undercounts
    * and overcounts by at most ε·N with prob ≥ δ per query — the oracle
    * emits the exact counts + literal true, green iff every estimate
    * lands inside [exact, exact + ε·N]. */
  def cmsFreq(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val bytes = ev
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val bc = ev.sparkSession.sparkContext.broadcast(cms)
    val estimate = udf((s: String) => bc.value.estimateCount(s))
    val grouped = ev.groupBy("event_type").agg(count(lit(1)).as("exact_n"))
    val tot = grouped.agg(sum("exact_n").as("total"))
    grouped.crossJoin(broadcast(tot))
      .withColumn("est", estimate(col("event_type")))
      .select(col("event_type"), col("exact_n"),
        (col("est") >= col("exact_n") &&
          col("est") <= col("exact_n") + ceil(col("total") * 0.001)).as("within_bound"))
      .orderBy("event_type")
  }

  /** Approximate median (percentile_approx — a mergeable rank sketch).
    * Same oracle shape as approxDistinct: the sketch value is
    * engine-specific, but its RANK-ERROR guarantee is checkable — with
    * accuracy 100 the returned value's rank is within n/100 of the true
    * median, so it must lie between the exact 45th and 55th percentiles
    * (5× slack; bounds come from the histogram-based quantilesOf, never a
    * full-table sort). The DuckDB oracle emits the group counts with a
    * literal TRUE — the row hash-matches iff the sketch honors its bound. */
  def approxQuantile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val bounds = quantilesOf(li, "l_returnflag", "l_extendedprice",
      Seq(0.45 -> "lo", 0.55 -> "hi"))
    val apx = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(100)).as("apx"),
        count(lit(1)).as("n"))
    apx.join(broadcast(bounds), "l_returnflag")
      .select(col("l_returnflag"), col("n"),
        (col("apx") >= col("lo") && col("apx") <= col("hi")).as("within_bound"))
      .orderBy("l_returnflag")
  }

  /** Tumbling 1-hour event-time windows, batch form of the streaming
    * aggregation (graft.streaming). Hour-bucket keys sidestep the
    * ns-vs-µs parquet timestamp precision gap (events.ts is ns; Spark
    * truncates to µs — raw ts output would never hash-match). */
  def eventHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("n"), col("total_value"))
      .orderBy("hour")

  /** Calendar resample + LOCF gap-fill: per event type, daily value sums
    * on a COMPLETE day calendar (generated per type from its own min/max
    * day), missing days forward-filled with the last observed sum — the
    * time-series regularization every metrics/feature pipeline runs
    * before models that assume an unbroken grid. Scale shape: the
    * calendar explode is bounded by (types × days), orders of magnitude
    * below the event count; the fill is one window per type, no
    * self-joins. `n` carries 0 on filled days so gaps stay observable. */
  def eventResample(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("value"))).cast("double"), 6).as("day_value"))
    val cal = daily.groupBy("event_type")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"))
      .orderBy("event_type", "day")
  }

  /** Rolling 7-day median of daily order revenue — an exact holistic
    * window aggregate Spark has no native window function for, expressed
    * scale-safely: the frame is BOUNDED (7 rows), so collect + sort per
    * row is O(7 log 7) regardless of history length, and the daily-sum
    * input is already one row per day. Median arithmetic is written out
    * explicitly (same element picks + same double ops) so both engines
    * compute bit-identical values rather than trusting two median()
    * implementations to interpolate alike. */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("rev"))
    // single-partition ordered window is SAFE here: the input is one row
    // per calendar DAY (cardinality grows with time, not data volume),
    // unlike a per-event window this never concentrates the corpus
    val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("win", array_sort(collect_list(col("rev")).over(w)))
      .select(col("day"), round(col("rev"), 6).as("rev"),
        size(col("win")).as("n_days"),
        round(when(size(col("win")) % 2 === 1,
            expr("element_at(win, cast((size(win) + 1) div 2 as int))"))
          .otherwise((expr("element_at(win, cast(size(win) div 2 as int))") +
            expr("element_at(win, cast(size(win) div 2 + 1 as int))")) / 2.0), 6)
          .as("median7"))
      .orderBy("day")
  }

  /** Sliding 2-hour windows advancing hourly — each event lands in two
    * buckets; expressed for the oracle as an explicit 2-element unnest. */
  def eventSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))
      .orderBy("win_start")

  /** JSON field extraction from events.props (regexp on both engines —
    * engine-portable and pushdown-friendly). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int").as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"))
      .orderBy("k")

  /** Typed/nested JSON extraction: `from_json` parses props against a
    * declared schema (the Spark-native path for structured metadata
    * columns — schema'd, codegen'd, null-safe on missing keys), unlike
    * jsonExtract's engine-portable regexp. Aggregates over the typed
    * field prove the values, not just the parse. */
  def jsonTyped(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Monthly revenue rollup on orders (date_trunc bucketing, ms-precision
    * timestamps are exact at µs on both engines). */
  def monthlyRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("month")

  /** Sessionization (30-min inactivity gap) via window functions — the
    * batch twin of the streaming flatMapGroupsWithState sessionizer.
    * All arithmetic on unix micros so both engines see identical values. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag("us", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_id", sum("is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        floor((max("us") - min("us")) / lit(1000000L)).cast("long").as("duration_s"))
      .orderBy("user_id", "session_id")
  }

  /** Session attribution — first/last-touch credit per purchase, the
    * standard marketing-analytics consumer of sessionization: each
    * purchase is attributed to the FIRST event of its 30-min-gap session
    * (first-touch: what acquired the user) and to the event immediately
    * BEFORE it in the session (last-touch: what converted; NULL when the
    * purchase itself opens the session — a direct conversion). Shape:
    * every window here is the SAME user_id partition the sessionizer
    * uses — session ids, first-touch (a running `last(..ignoreNulls)`
    * over the conditionally-set session-start columns, so id and type
    * come from the same row by construction), and last-touch (a lag
    * masked to same-session rows) all ride one exchange; no join, no
    * second shuffle, the sessionize plan-guard family. */
  def sessionAttribution(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag("us", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_id", sum("is_new").over(run))
      .withColumn("first_touch_id",
        last(when(col("is_new") === 1, col("event_id")), ignoreNulls = true).over(run))
      .withColumn("first_touch_type",
        last(when(col("is_new") === 1, col("event_type")), ignoreNulls = true).over(run))
      .withColumn("last_touch_id",
        when(col("is_new") === 0, lag("event_id", 1).over(byUser)))
      .withColumn("last_touch_type",
        when(col("is_new") === 0, lag("event_type", 1).over(byUser)))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("session_id"),
        col("event_id").as("purchase_id"),
        col("first_touch_id"), col("first_touch_type"),
        col("last_touch_id"), col("last_touch_type"))
      .orderBy("user_id", "session_id", "purchase_id")
  }

  /** Sessionization via Spark's NATIVE session_window aggregation — the
    * declarative twin of the window-lag `sessionize` above (and of the
    * streaming flatMapGroupsWithState sessionizer): merging gap-bounded
    * sessions happens inside the aggregate, no per-user ordered window
    * over raw events. The only window here numbers each user's few
    * SESSIONS by start time to reconstruct sessionize's ordinal
    * session_id — bounded by sessions-per-user, not events. Same oracle
    * as `sessionize`: three implementations, one answer. session_window's
    * end = last event + gap, so duration = end − start − gap exactly. */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val perUser = Window.partitionBy("user_id").orderBy("start_us")
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"))
      .withColumn("session_id", row_number().over(perUser).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        floor((col("end_us") - col("start_us") - gapUs) / lit(1000000L))
          .cast("long").as("duration_s"))
      .orderBy("user_id", "session_id")
  }

  /** As-of join (composed from built-ins, SURVEY preference (a)): for each
    * error event, the most recent prior purchase by the same user — the
    * classic event-enrichment shape. One shuffle on user_id; the "join"
    * is a running IGNORE NULLS last_value, so it never materializes
    * candidate pairs. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_purchase_us",
        last(when(col("event_type") === "purchase", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"),
        coalesce(floor((col("us") - col("prev_purchase_us")) / lit(1000000L)).cast("long"),
          lit(-1L)).as("secs_since_purchase"))
      .orderBy("user_id", "event_id")
  }

  /** Forward as-of join with a tolerance band: for each error event, the
    * NEXT purchase by the same user but only within 30 minutes —
    * outside the band the match is rejected (the tolerance semantics
    * pandas merge_asof calls `tolerance`). Same single-shuffle running-
    * window shape as asofJoin, direction reversed. */
  def asofJoinTolerance(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_purchase_us",
        first(when(col("event_type") === "purchase", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"),
        when(col("next_purchase_us") - col("us") <= 1800L * 1000000,
          floor((col("next_purchase_us") - col("us")) / lit(1000000L)).cast("long"))
          .otherwise(lit(-1L)).as("secs_to_purchase"))
      .select(col("user_id"), col("event_id"),
        coalesce(col("secs_to_purchase"), lit(-1L)).as("secs_to_purchase"))
      .orderBy("user_id", "event_id")
  }

  /** Exact interpolated quantiles per group, histogram-based: a
    * partial+final aggregate builds the per-(group, value) count
    * histogram, cumulative counts over the histogram locate the two
    * straddling ranks per percentile, and one more aggregation pass
    * interpolates. Matches DuckDB `quantile_cont` (pos = p·(n−1), linear
    * interpolation).
    *
    * Scale note: the ONLY per-group sort here is the cumulative-count
    * window over the HISTOGRAM — bounded by distinct-value cardinality
    * (prices have fixed precision), not corpus size — so the ≤4-value
    * group key never becomes a full-table single-reducer sort the way a
    * row_number over raw rows would. Spark's builtin exact `percentile`
    * materializes the same value→count map but per-group in one task —
    * measured 12 s vs ~1 s for this formulation at sf0.1. */
  def quantilesOf(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(Double, String)]): DataFrame = {
    val hist = df
      .select(col(groupCol), col(valueCol).as("x"))
      .groupBy(groupCol, "x")
      .agg(count(lit(1)).as("c"))
    val byGroup = Window.partitionBy(groupCol)
    val cum = hist
      .withColumn("cum", sum("c").over(byGroup.orderBy("x")))
      .withColumn("n", sum("c").over(byGroup))
    val qCols = ps.map { case (p, name) =>
      val pos = lit(p) * (col("n") - 1)
      val lo = floor(pos).cast("long") + 1
      val hi = ceil(pos).cast("long") + 1
      val frac = pos - floor(pos)
      val prev = col("cum") - col("c")
      val vlo = max(when(prev < lo && lo <= col("cum"), col("x")))
      val vhi = max(when(prev < hi && hi <= col("cum"), col("x")))
      round(vlo + (vhi - vlo) * max(frac), 4).as(name)
    }
    cum.groupBy(groupCol)
      .agg(qCols.head, qCols.tail: _*)
      .orderBy(groupCol)
  }

  def quantiles(spark: SparkSession, dir: String): DataFrame =
    quantilesOf(Tables.lineitem(spark, dir), "l_returnflag", "l_extendedprice",
      Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"))

  /** Winsorization: clip each event's value to its type's exact
    * [p05, p95] band and report the clip counts + clipped mean — the
    * outlier-robust companion to outliers_zscore (which flags; this
    * repairs). Bounds come from the histogram-based quantilesOf (no
    * full-table sort at any group cardinality) and are broadcast, so the
    * clipping pass stays map-only; the clipped mean is an exact decimal
    * sum. The histogram-size precondition holds: value is fixed
    * 2-decimal precision (measured: every value equals round(value, 2)),
    * so distinct cardinality is bounded by the value GRID, not by row
    * count — for a genuinely continuous metric, discretize to the
    * measurement precision before the histogram. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val bounds = quantilesOf(ev, "event_type", "value",
      Seq(0.05 -> "lo", 0.95 -> "hi"))
    ev.join(broadcast(bounds), "event_type")
      .select(col("event_type"),
        when(col("value") < col("lo"), 1L).otherwise(0L).as("cl"),
        when(col("value") > col("hi"), 1L).otherwise(0L).as("ch"),
        when(col("value") < col("lo"), col("lo"))
          .when(col("value") > col("hi"), col("hi"))
          .otherwise(col("value")).cast("decimal(18,6)").as("cv"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("cl").as("n_clip_low"), sum("ch").as("n_clip_high"),
        round(sum("cv").cast("double") / count(lit(1)), 6).as("clipped_mean"))
      .orderBy("event_type")
  }

  /** Mean/variance from exact decimal moments: var = (Σx² − (Σx)²/n)/(n−1)
    * computed on DECIMAL sums, so the result is order-independent — the
    * float-safe way to do distributed second-moment statistics. */
  def statsAgg(spark: SparkSession, dir: String): DataFrame = {
    val x = dec(col("l_quantity"))
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_x"),
        sum((x * x).cast("decimal(28,4)")).cast("double").as("sum_x2"))
      .select(col("l_returnflag"), col("n"),
        round(col("sum_x") / col("n"), 6).as("mean"),
        round((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / (col("n") - 1), 6).as("variance"))
      .orderBy("l_returnflag")
  }

  /** Range (interval-containment) join: orders banded by a broadcast
    * interval table — BroadcastNestedLoopJoin against 11 rows, which is
    * exactly the right plan: the fact side streams map-only. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.range(0, 11).select(
      col("id").cast("int").as("band"),
      (col("id") * 50000).cast("double").as("lo"),
      ((col("id") + 1) * 50000).cast("double").as("hi"))
    Tables.orders(spark, dir)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy("band")
  }

  /** Skew-tolerant two-phase aggregation: deterministic salt spreads a hot
    * key over 8 reducers in phase 1 (partial per (key, salt)), phase 2
    * combines the 8 partials per key. On a skewed 100 TB key distribution
    * this bounds any single reducer's input; with a deterministic salt the
    * result is exactly the plain groupBy. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy("user_id", "salt")
      .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("pv"))
      .groupBy("user_id")
      .agg(sum("pn").as("n"), sum("pv").cast("double").as("total_value"))
      .orderBy("user_id")

  /** Pivot (crosstab): events per user × event_type. Explicit value list
    * keeps it a single pass (no distinct-values pre-query). */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "purchase", "error", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** Pearson correlation from exact decimal moments — same
    * order-independence argument as statsAgg: five exact sums, then one
    * deterministic double formula. */
  def corrAgg(spark: SparkSession, dir: String): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum((x * x).cast("decimal(28,4)")).cast("double").as("sxx"),
        sum((y * y).cast("decimal(28,4)")).cast("double").as("syy"),
        sum((x * y).cast("decimal(28,4)")).cast("double").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr"))
      .orderBy("l_returnflag")
  }

  /** RANGE-frame window: per-user rolling 1-hour event-value sum (frame
    * bounded by event-time distance, not row count) on unix micros. */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-3600L * 1000000, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        dec(col("value")).as("v"))
      .withColumn("rolling_1h", sum("v").over(w).cast("double"))
      .select("user_id", "event_id", "rolling_1h")
      .orderBy("user_id", "event_id")
  }

  /** TPC-H Q7-style volume shipping: revenue flowing between two nations
    * in both supplier→customer directions, by ship year. The two tiny
    * filtered nation maps broadcast; lineitem⋈orders is the one fact
    * shuffle, supplier/customer collapse to (key, nation) before joining
    * so only keys and a nation name ride the exchanges. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nations = broadcast(Tables.nation(spark, dir)
      .filter(col("n_name").isin("NATION_1", "NATION_2")))
    val supp = Tables.supplier(spark, dir)
      .join(nations, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(nations, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q10-style returned-item report: revenue lost to returns per
    * customer over a quarter, top 20. Facts collapse to needed columns
    * pre-join; the final top-20 plans TakeOrderedAndProject (no global
    * sort materialization). */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-04-01")))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13-style customer distribution: how many customers placed k
    * orders, INCLUDING zero (the left join is the point — an inner join
    * silently drops never-ordered customers). Two partial+final
    * aggregates after one key-partitioned join; output bounded by
    * max-orders-per-customer. */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select("c_custkey")
      .join(Tables.orders(spark, dir).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_custkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  /** Month-over-month revenue growth: the event-scale work is one
    * partial+final aggregate to the tiny monthly table; the lag window
    * runs over ~tens of rows. Growth in basis points as exact integer
    * arithmetic on decimal cents (no float division race). */
  def monthlyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"))
    val w = Window.orderBy("month")
    // exact floor division on integer cents: floor(a/b) = (a − pmod(a,b))/b
    // — identical on both engines for negative growth months, where
    // truncating `div` and flooring `//` would disagree
    val a = (col("rev_c") - col("prev_c")) * 10000L
    val b = col("prev_c")
    monthly
      .select(col("month"), col("revenue"),
        (col("revenue") * 100).cast("long").as("rev_c"))
      .withColumn("prev_c", lag(col("rev_c"), 1).over(w))
      .select(col("month"), col("revenue").cast("double").as("revenue"),
        when(col("prev_c").isNotNull,
          ((a - pmod(a, b)) / b).cast("long"))
          .otherwise(lit(null)).as("growth_bps"))
      .orderBy("month")
  }

  /** Revenue share per part brand in exact basis points: one fact join,
    * one grouped decimal-cents aggregate, the scalar total broadcast
    * back, and the share computed with the same exact floor-division-on-
    * cents identity as monthlyGrowth — no float ratio anywhere. */
  def brandShare(spark: SparkSession, dir: String): DataFrame = {
    val byBrand = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_extendedprice")
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg((sum(dec(col("l_extendedprice"))) * 100).cast("long").as("rev_c"))
    val total = byBrand.agg(sum(col("rev_c")).as("total_c"))
    val a = col("rev_c") * 10000L
    val b = col("total_c")
    byBrand.crossJoin(broadcast(total))
      .select(col("p_brand"), (col("rev_c").cast("double") / 100).as("revenue"),
        ((a - pmod(a, b)) / b).cast("long").as("share_bps"))
      .orderBy("p_brand")
  }

  /** Open-order timeline by sweep line: each order contributes +1 at its
    * order day and −1 the day after its last line ships; the running sum
    * over the DAY timeline is the number of open orders. The classic
    * interval-overlap counting shape without an interval join: two
    * aggregates collapse the facts to ±1 deltas on a bounded timeline,
    * and the only window runs over that tiny day table. */
  def openOrdersTimeline(spark: SparkSession, dir: String): DataFrame = {
    val spans = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(max(col("l_shipdate")).as("last_ship"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(date_trunc("day", col("o_orderdate")).as("start_day"),
        date_add(date_trunc("day", col("last_ship")), 1).as("end_day"))
    val deltas = spans.select(col("start_day").as("day"), lit(1L).as("delta"))
      .unionAll(spans.select(col("end_day").cast("timestamp").as("day"), lit(-1L).as("delta")))
      .groupBy("day").agg(sum(col("delta")).as("d"))
    deltas
      .withColumn("open_orders",
        sum(col("d")).over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), col("open_orders"))
      .orderBy("day")
  }

  /** Fulfillment-lag histogram: days between order and line shipment,
    * bucketed in weeks — the operational latency distribution. One fact
    * join on the order key, then a bounded aggregate (lag domain is
    * contract-bounded); no windows. */
  def shipLagHist(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select((floor(datediff(col("l_shipdate"), col("o_orderdate")) / 7)
        .cast("long")).as("lag_weeks"))
      .groupBy("lag_weeks").agg(count(lit(1)).as("n_lines"))
      .orderBy("lag_weeks")

  /** TPC-H Q16-style supplier diversity: distinct suppliers per part
    * (brand, size) with an exclusion list removed by anti-join BEFORE
    * the distinct aggregation (lineitem's (part, supplier) pairs stand
    * in for partsupp, which the testdata lacks). The pair-distinct is
    * partial+final; the small negative-balance supplier list broadcasts
    * into the anti-join. */
  def q16PartSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
    val excluded = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    pairs.join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_size"))
  }

  /** Mode (most frequent event_type) per user as two partial+final
    * aggregates — never a window over raw events: counts per
    * (user, type), then min_by over a (−count, type) struct so ties
    * break to the lexicographically smallest type on both engines. */
  def modeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(min_by(struct(col("event_type"), col("cnt")),
        struct((-col("cnt")).as("nc"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_type").as("mode_event"),
        col("m.cnt").as("n_events"))
      .orderBy("user_id")

  /** Wide→long unpivot of the lineitem measures, then a per-measure
    * profile. The melt is a map-side Expand (no shuffle, no extra scan
    * per measure — the single-scan advantage over the oracle's
    * UNION-ALL-of-aggregates formulation); the profile is one
    * partial+final aggregate over 4 keys. */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .unpivot(Array.empty[Column], "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("n_rows"),
        min(col("value")).as("v_min"), max(col("value")).as("v_max"),
        round(sum(dec(col("value"))).cast("double") / count(lit(1)), 6).as("v_mean"))
      .orderBy("measure")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q7_volume_shipping" -> q7VolumeShipping,
    "q10_returned_items" -> q10ReturnedItems,
    "q13_customer_distribution" -> q13CustomerDistribution,
    "q16_part_suppliers" -> q16PartSuppliers,
    "ship_lag_hist" -> shipLagHist,
    "open_orders_timeline" -> openOrdersTimeline,
    "brand_share" -> brandShare,
    "monthly_growth" -> monthlyGrowth,
    "mode_agg" -> modeAgg,
    "unpivot_measures" -> unpivotMeasures,
    "corr_agg" -> corrAgg,
    "window_range_frame" -> windowRangeFrame,
    "pivot_counts" -> pivotCounts,
    "salted_agg" -> saltedAgg,
    "range_join" -> rangeJoin,
    "asof_join" -> asofJoin,
    "asof_join_tolerance" -> asofJoinTolerance,
    "quantiles" -> quantiles,
    "winsorize" -> winsorize,
    "stats_agg" -> statsAgg,
    "q1_pricing" -> q1Pricing,
    "q2_min_cost_supplier" -> q2MinCostSupplier,
    "q3_revenue" -> q3Revenue,
    "q5_region_revenue" -> q5RegionRevenue,
    "left_outer_join" -> leftOuterJoin,
    "right_outer_join" -> rightOuterJoin,
    "full_outer_join" -> fullOuterJoin,
    "window_topn" -> windowTopn,
    "window_ntile" -> windowNtile,
    "event_resample" -> eventResample,
    "rolling_median" -> rollingMedian,
    "window_running" -> windowRunning,
    "rollup_agg" -> rollupAgg,
    "cube_agg" -> cubeAgg,
    "distinct_users" -> distinctUsers,
    "approx_distinct" -> approxDistinct,
    "hll_daily_merge" -> hllDailyMerge,
    "theta_overlap" -> thetaOverlap,
    "cms_freq" -> cmsFreq,
    "approx_quantile" -> approxQuantile,
    "event_hourly" -> eventHourly,
    "event_sliding" -> eventSliding,
    "json_extract" -> jsonExtract,
    "json_typed" -> jsonTyped,
    "monthly_revenue" -> monthlyRevenue,
    "sessionize" -> sessionize,
    "session_window_agg" -> sessionWindowAgg,
    "session_attribution" -> sessionAttribution,
  )

  private val disc = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"

  val oracle: Map[String, String] = Map(
    "q7_volume_shipping" ->
      (s"SELECT s.n_name AS supp_nation, c.n_name AS cust_nation, " +
        "CAST(year(l_shipdate) AS INT) AS l_year, " +
        s"CAST(sum($disc) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation s ON s_nationkey = s.n_nationkey " +
        "JOIN nation c ON c_nationkey = c.n_nationkey " +
        "WHERE s.n_name IN ('NATION_1', 'NATION_2') " +
        "AND c.n_name IN ('NATION_1', 'NATION_2') AND s.n_name <> c.n_name " +
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
    "q10_returned_items" ->
      (s"SELECT c_custkey, c_name, n_name, CAST(sum($disc) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1997-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-04-01' " +
        "GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20"),
    "asof_join_tolerance" ->
      ("SELECT user_id, event_id, coalesce(CASE WHEN next_purchase_us - us <= 1800000000 " +
        "THEN CAST(floor((next_purchase_us - us) / 1000000) AS BIGINT) ELSE -1 END, -1) AS secs_to_purchase FROM " +
        "(SELECT user_id, event_id, event_type, epoch_us(ts) AS us, " +
        "first_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id " +
        "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase_us FROM events) " +
        "WHERE event_type = 'error' ORDER BY user_id, event_id"),
    "q13_customer_distribution" ->
      ("SELECT c_count, count(*) AS custdist FROM " +
        "(SELECT c_custkey, count(o_custkey) AS c_count FROM customer " +
        "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) " +
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
    "brand_share" ->
      ("WITH b AS (SELECT p_brand, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand), " +
        "t AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total_c FROM b) " +
        "SELECT p_brand, CAST(rev_c AS DOUBLE) / 100 AS revenue, " +
        "CAST((rev_c * 10000 - ((rev_c * 10000 % total_c + total_c) % total_c)) / total_c AS BIGINT) AS share_bps " +
        "FROM b CROSS JOIN t ORDER BY p_brand"),
    "open_orders_timeline" ->
      ("WITH spans AS (SELECT date_trunc('day', o_orderdate) AS start_day, " +
        "date_trunc('day', last_ship) + INTERVAL 1 DAY AS end_day " +
        "FROM (SELECT l_orderkey, max(l_shipdate) AS last_ship FROM lineitem GROUP BY 1) li " +
        "JOIN orders ON l_orderkey = o_orderkey), " +
        "d AS (SELECT day, sum(delta) AS d FROM (" +
        "SELECT start_day AS day, 1 AS delta FROM spans " +
        "UNION ALL SELECT end_day, -1 FROM spans) GROUP BY day) " +
        "SELECT day, CAST(sum(d) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open_orders " +
        "FROM d ORDER BY day"),
    "monthly_growth" ->
      ("WITH m AS (SELECT date_trunc('month', o_orderdate) AS month, " +
        "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue FROM orders GROUP BY 1), " +
        "c AS (SELECT month, revenue, CAST(revenue * 100 AS BIGINT) AS rev_c, " +
        "lag(CAST(revenue * 100 AS BIGINT), 1) OVER (ORDER BY month) AS prev_c FROM m) " +
        "SELECT month, CAST(revenue AS DOUBLE) AS revenue, " +
        "CASE WHEN prev_c IS NOT NULL THEN " +
        "CAST(((rev_c - prev_c) * 10000 - ((((rev_c - prev_c) * 10000) % prev_c + prev_c) % prev_c)) / prev_c AS BIGINT) " +
        "ELSE NULL END AS growth_bps FROM c ORDER BY month"),
    "ship_lag_hist" ->
      ("SELECT CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 7) AS BIGINT) AS lag_weeks, " +
        "count(*) AS n_lines FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY lag_weeks"),
    "q16_part_suppliers" ->
      ("SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt FROM " +
        "(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps " +
        "JOIN part ON l_partkey = p_partkey " +
        "WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
        "GROUP BY p_brand, p_size ORDER BY supplier_cnt DESC, p_brand, p_size"),
    "mode_agg" ->
      ("SELECT user_id, event_type AS mode_event, cnt AS n_events FROM " +
        "(SELECT user_id, event_type, cnt, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn FROM " +
        "(SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2)) " +
        "WHERE rn = 1 ORDER BY user_id"),
    "unpivot_measures" -> {
      def m(name: String) =
        s"SELECT '$name' AS measure, count(*) AS n_rows, min($name) AS v_min, max($name) AS v_max, " +
          s"round(CAST(sum(CAST($name AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS v_mean FROM lineitem"
      s"SELECT * FROM (${Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map(m).mkString(" UNION ALL ")}) ORDER BY measure"
    },
    "corr_agg" ->
      ("SELECT l_returnflag, n, round((n * sxy - sx * sy) / " +
        "sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr FROM " +
        "(SELECT l_returnflag, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS syy, " +
        "CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxy " +
        "FROM lineitem GROUP BY l_returnflag) ORDER BY l_returnflag"),
    "window_range_frame" ->
      ("SELECT user_id, event_id, CAST(sum(CAST(value AS DECIMAL(18,2))) OVER " +
        "(PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_1h " +
        "FROM events ORDER BY user_id, event_id"),
    "pivot_counts" ->
      ("SELECT user_id, " +
        "count(*) FILTER (WHERE event_type = 'click') AS click, " +
        "count(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
        "count(*) FILTER (WHERE event_type = 'error') AS error, " +
        "count(*) FILTER (WHERE event_type = 'signup') AS signup, " +
        "count(*) FILTER (WHERE event_type = 'view') AS view " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "salted_agg" ->
      ("SELECT user_id, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "range_join" ->
      ("WITH bands AS (SELECT CAST(i AS INT) AS band, i * 50000.0 AS lo, (i + 1) * 50000.0 AS hi " +
        "FROM (SELECT unnest(generate_series(0, 10)) AS i)) " +
        "SELECT band, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total " +
        "FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi " +
        "GROUP BY band ORDER BY band"),
    "asof_join" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events), " +
        "enriched AS (SELECT user_id, event_id, event_type, us, " +
        "last_value(CASE WHEN event_type = 'purchase' THEN us END IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_us " +
        "FROM e) " +
        "SELECT user_id, event_id, coalesce(CAST(floor((us - prev_purchase_us) / 1000000) AS BIGINT), -1) AS secs_since_purchase " +
        "FROM enriched WHERE event_type = 'error' ORDER BY user_id, event_id"),
    "quantiles" ->
      ("SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS p50, " +
        "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90, " +
        "round(quantile_cont(l_extendedprice, 0.99), 4) AS p99 " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "winsorize" ->
      ("WITH b AS (SELECT event_type, round(quantile_cont(value, 0.05), 4) AS lo, " +
        "round(quantile_cont(value, 0.95), 4) AS hi FROM events GROUP BY event_type) " +
        "SELECT e.event_type, count(*) AS n, " +
        "CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low, " +
        "CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high, " +
        "round(CAST(sum(CAST(CASE WHEN value < lo THEN lo WHEN value > hi THEN hi " +
        "ELSE value END AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS clipped_mean " +
        "FROM events e JOIN b USING (event_type) " +
        "GROUP BY e.event_type ORDER BY e.event_type"),
    "stats_agg" ->
      ("SELECT l_returnflag, n, round(sum_x / n, 6) AS mean, " +
        "round((sum_x2 - sum_x * sum_x / n) / (n - 1), 6) AS variance FROM " +
        "(SELECT l_returnflag, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_x, " +
        "CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_x2 " +
        "FROM lineitem GROUP BY l_returnflag) ORDER BY l_returnflag"),
    "q1_pricing" ->
      ("SELECT l_returnflag, l_linestatus, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
        s"CAST(sum($disc) AS DOUBLE) AS sum_disc_price, count(*) AS count_order, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q2_min_cost_supplier" ->
      ("WITH costs AS (SELECT l_partkey, l_suppkey, " +
        "min(CAST(l_extendedprice AS DECIMAL(18,2))) AS min_price " +
        "FROM lineitem GROUP BY l_partkey, l_suppkey), " +
        "best AS (SELECT l_partkey, l_suppkey, min_price, row_number() OVER " +
        "(PARTITION BY l_partkey ORDER BY min_price, l_suppkey) AS rn FROM costs) " +
        "SELECT p_partkey, p_name, s_suppkey, s_name, CAST(min_price AS DOUBLE) AS min_price " +
        "FROM best JOIN part ON l_partkey = p_partkey JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE rn = 1 ORDER BY p_partkey"),
    "left_outer_join" ->
      ("SELECT c_custkey, c_name, count(o_orderkey) AS n_orders, " +
        "CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey, c_name ORDER BY c_custkey"),
    "right_outer_join" ->
      ("SELECT p_partkey, p_brand, count(l_orderkey) AS n_items " +
        "FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey " +
        "GROUP BY p_partkey, p_brand ORDER BY p_partkey"),
    "full_outer_join" ->
      ("SELECT coalesce(r.ck, b.ok) AS custkey, r.acctbal, " +
        "CAST(coalesce(b.nb, 0) AS BIGINT) AS n_big FROM " +
        "(SELECT c_custkey AS ck, c_acctbal AS acctbal FROM customer WHERE c_acctbal > 9000) r " +
        "FULL OUTER JOIN " +
        "(SELECT o_custkey AS ok, count(*) AS nb FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey) b " +
        "ON r.ck = b.ok ORDER BY custkey"),
    "q3_revenue" ->
      (s"SELECT l_orderkey, o_orderdate, CAST(sum($disc) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "AND l_shipdate > TIMESTAMP '1998-01-01' " +
        "GROUP BY l_orderkey, o_orderdate ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "q5_region_revenue" ->
      (s"SELECT n_name, CAST(sum($disc) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name IN ('ASIA', 'EUROPE') " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name"),
    "window_topn" ->
      ("SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM " +
        "(SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, " +
        "row_number() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn " +
        "FROM lineitem) WHERE rn <= 3 ORDER BY l_suppkey, rn"),
    "event_resample" ->
      ("""WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n,
         |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS day_value
         |  FROM events GROUP BY 1, 2),
         |cal AS (SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
         |  FROM (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY event_type))
         |SELECT c.event_type, c.day, coalesce(d.n, 0) AS n,
         |  last_value(d.day_value IGNORE NULLS) OVER
         |    (PARTITION BY c.event_type ORDER BY c.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
         |FROM cal c LEFT JOIN daily d ON d.event_type = c.event_type AND d.day = c.day
         |ORDER BY c.event_type, c.day""".stripMargin),
    "rolling_median" ->
      ("""WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev FROM orders GROUP BY 1),
         |win AS (SELECT day, rev, list_sort(list(rev) OVER
         |  (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS w FROM daily)
         |SELECT day, round(rev, 6) AS rev, CAST(len(w) AS INT) AS n_days,
         |  round(CASE WHEN len(w) % 2 = 1 THEN w[(len(w) + 1) // 2]
         |        ELSE (w[len(w) // 2] + w[len(w) // 2 + 1]) / 2.0 END, 6) AS median7
         |FROM win ORDER BY day""".stripMargin),
    "window_ntile" ->
      ("SELECT event_id, event_type, value, " +
        "CAST(ntile(4) OVER w AS INT) AS quartile, " +
        "round(percent_rank() OVER w, 6) AS pct_rank, " +
        "round(cume_dist() OVER w, 6) AS cume " +
        "FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id) " +
        "ORDER BY event_id"),
    "window_running" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend " +
        "FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"),
    "rollup_agg" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total FROM orders " +
        "GROUP BY ROLLUP (o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"),
    "cube_agg" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem " +
        "GROUP BY CUBE (l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
    "distinct_users" ->
      ("SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "approx_distinct" ->
      ("SELECT event_type, count(DISTINCT user_id) AS exact_users, " +
        "true AS within_5pct FROM events GROUP BY event_type ORDER BY event_type"),
    "hll_daily_merge" ->
      ("SELECT event_type, CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days, " +
        "count(DISTINCT user_id) AS exact_users, " +
        "true AS within_5pct FROM events GROUP BY event_type ORDER BY event_type"),
    "theta_overlap" ->
      ("WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events) " +
        "SELECT a.day AS day, CAST(count(*) AS BIGINT) AS exact_retained, " +
        "true AS within_5pct FROM du a JOIN du b " +
        "ON a.user_id = b.user_id AND b.day = a.day + 1 " +
        "GROUP BY a.day ORDER BY day"),
    "cms_freq" ->
      ("SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n, " +
        "true AS within_bound FROM events GROUP BY event_type ORDER BY event_type"),
    "approx_quantile" ->
      ("SELECT l_returnflag, count(*) AS n, true AS within_bound " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "event_hourly" ->
      ("SELECT date_trunc('hour', ts) AS hour, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "event_sliding" ->
      ("SELECT win_start, count(*) AS n FROM (SELECT unnest([date_trunc('hour', ts), " +
        "date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start FROM events) " +
        "GROUP BY win_start ORDER BY win_start"),
    "json_extract" ->
      // TRY_CAST: on a row without "k" regexp_extract yields '' — DuckDB
      // CAST('' AS INT) errors while Spark returns null; TRY_CAST mirrors
      // Spark's null-on-no-match instead of aborting the oracle.
      ("SELECT TRY_CAST(regexp_extract(props, '\"k\":\\s*(\\d+)', 1) AS INT) AS k, count(*) AS n " +
        "FROM events GROUP BY k ORDER BY k"),
    "json_typed" ->
      // sum(INT) is HUGEINT in DuckDB (pandas-renders as float) — pin
      // BIGINT to match Spark's sum(int)=bigint; min/max stay INT.
      // json_valid guard + TRY_CAST: DuckDB json_extract ERRORS on
      // malformed JSON and CAST errors on non-numeric values, where
      // Spark's from_json/field access yields NULL — mirror the
      // null-on-corrupt semantics instead of aborting the oracle.
      ("SELECT event_type, count(k) AS n_k, CAST(sum(k) AS BIGINT) AS sum_k, " +
        "min(k) AS min_k, max(k) AS max_k FROM " +
        "(SELECT event_type, TRY_CAST(json_extract(" +
        "CASE WHEN json_valid(props) THEN props END, '$.k') AS INT) AS k FROM events) " +
        "GROUP BY event_type ORDER BY event_type"),
    "monthly_revenue" ->
      ("SELECT date_trunc('month', o_orderdate) AS month, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, count(*) AS n_orders " +
        "FROM orders GROUP BY 1 ORDER BY 1"),
    "sessionize" -> sessionizeSql,
    "session_attribution" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events), " +
        "flagged AS (SELECT user_id, event_id, event_type, us, " +
        "CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 30*60*1000000 THEN 1 ELSE 0 END AS is_new, " +
        "lag(event_id) OVER w AS prev_id, lag(event_type) OVER w AS prev_type " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), " +
        "attributed AS (SELECT user_id, event_id, event_type, is_new, prev_id, prev_type, " +
        "CAST(sum(is_new) OVER wr AS BIGINT) AS session_id, " +
        "last_value(CASE WHEN is_new = 1 THEN event_id END IGNORE NULLS) OVER wr AS first_touch_id, " +
        "last_value(CASE WHEN is_new = 1 THEN event_type END IGNORE NULLS) OVER wr AS first_touch_type " +
        "FROM flagged WINDOW wr AS (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT user_id, session_id, event_id AS purchase_id, " +
        "first_touch_id, first_touch_type, " +
        "CASE WHEN is_new = 0 THEN prev_id END AS last_touch_id, " +
        "CASE WHEN is_new = 0 THEN prev_type END AS last_touch_type " +
        "FROM attributed WHERE event_type = 'purchase' " +
        "ORDER BY user_id, session_id, purchase_id"),
    // session_window_agg computes the same sessions a third way (native
    // session_window aggregate); one oracle, three implementations
    "session_window_agg" -> sessionizeSql,
  )

  private lazy val sessionizeSql: String =
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events), " +
      "flagged AS (SELECT user_id, event_id, us, " +
      "CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 30*60*1000000 THEN 1 ELSE 0 END AS is_new " +
      "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), " +
      // CAST: DuckDB sum(int) is HUGEINT, which pandas renders as float
      // ("1.0") while Spark's window sum is BIGINT ("1") — the driver's
      // value-hash compare is representation-sensitive, so pin BIGINT.
      "sessions AS (SELECT user_id, us, " +
      "CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id " +
      "FROM flagged) " +
      "SELECT user_id, session_id, count(*) AS n_events, " +
      "CAST(floor((max(us) - min(us)) / 1000000) AS BIGINT) AS duration_s " +
      "FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id"
}
