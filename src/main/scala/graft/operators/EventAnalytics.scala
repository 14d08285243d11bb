package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product-analytics queries over the events stream table: cohort
  * retention, Markov transition counts, and an ordered conversion funnel.
  * These are the shapes a behavioral pipeline runs daily at 100 TB; all
  * three are one-or-two-shuffle plans keyed on user_id, with time
  * arithmetic on unix micros (exact on both engines — events.ts is
  * ns-precision parquet, truncated identically via Tables.events).
  */
object EventAnalytics {

  /** Day-cohort retention triangle: users grouped by first-active day,
    * counted on each later active day. Classic two-phase shape: distinct
    * user-days (one shuffle), per-user min via window (reuses the same
    * hash partitioning — no second exchange), then a small aggregate.
    * Day buckets, not raw timestamps, so the output is dense and tiny
    * regardless of event volume. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
      .withColumn("cohort", min("day").over(byUser))
      .withColumn("day_offset", datediff(col("day"), col("cohort")).cast("long"))
      .groupBy("cohort", "day_offset")
      // user-day pairs are distinct, so count(*) IS distinct users
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort", "day_offset")
  }

  /** First-order Markov transition counts: (event_type → next event_type)
    * per user-ordered stream. One window pass (lead) + one aggregate;
    * output cardinality is |types|² — constant — however large the log. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "next_type")
  }

  /** Ordered conversion funnel view → click → purchase: each stage is the
    * user's FIRST qualifying event strictly after the previous stage
    * (min-after-threshold, not mere event presence). Three per-user
    * aggregates chained by joins — every join is on user_id, so AQE keeps
    * them co-partitioned; nothing ever materializes per-event pairs. */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = base.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("vus"))
    val c = base.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("vus"))
      .groupBy("user_id").agg(min("us").as("cus"))
    val p = base.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("cus"))
      .groupBy("user_id").agg(min("us").as("pus"))
    base.select("user_id").distinct()
      .join(v.select("user_id").withColumn("s1", lit(1)), Seq("user_id"), "left")
      .join(c.select("user_id").withColumn("s2", lit(1)), Seq("user_id"), "left")
      .join(p.select("user_id").withColumn("s3", lit(1)), Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("s1"), lit(0)).as("reached_view"),
        coalesce(col("s2"), lit(0)).as("reached_click"),
        coalesce(col("s3"), lit(0)).as("reached_purchase"))
      .orderBy("user_id")
  }

  /** Latest event per user as a pure AGGREGATE (max_by over a
    * (ts, event_id) ordering struct), not a window: partial+final
    * HashAggregate keeps one candidate row per key per partition — no
    * per-key sort, no full row shuffle — which is the shape that survives
    * a key whose history is millions of events. The unique event_id
    * tie-breaks equal timestamps, so the result is deterministic on any
    * engine (the DuckDB oracle states the same order as a window since it
    * lacks struct-valued arg_max — oracle shape need not be agg-shaped). */
  def latestByKey(spark: SparkSession, dir: String): DataFrame = {
    val ord = struct(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg(max(col("us")).as("last_us"),
        max_by(col("event_id"), ord).as("last_event_id"),
        max_by(col("event_type"), ord).as("last_type"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Exponentially-weighted moving average of hourly event counts
    * (α = 1/2, 6-hour lookback). Weights are dyadic (2^−k) and counts are
    * integers, so every product and both sums are exact in binary —
    * cross-engine deterministic with no decimal machinery. Missing hours
    * contribute nothing; the normalizer is the weight-sum of PRESENT
    * hours. The only event-scale pass is the hourly aggregate — the EWMA
    * itself is a bounded range self-join of the tiny (type, hour) table. */
  def ewmaHourly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", (unix_micros(col("hour_ts")) / 3600000000L).cast("long"))
    hourly.as("a").join(hourly.as("b"),
      col("a.event_type") === col("b.event_type") &&
        col("b.h") >= col("a.h") - 6 && col("b.h") <= col("a.h"))
      .groupBy(col("a.event_type"), col("a.hour_ts"), col("a.cnt"))
      .agg((sum(col("b.cnt") * pow(lit(0.5), col("a.h") - col("b.h"))) /
        sum(pow(lit(0.5), col("a.h") - col("b.h")))).as("ewma_raw"))
      .select(col("event_type"), col("hour_ts"), col("cnt"),
        round(col("ewma_raw"), 6).as("ewma"))
      .orderBy("event_type", "hour_ts")
  }

  /** EWMA-residual anomaly screen: hours whose count deviates from the
    * 6-hour EWMA by more than 50% — the smoothed-baseline alerting shape
    * (raw thresholds page on daily seasonality; the EWMA baseline
    * doesn't). Pure composition over ewmaHourly's tiny hourly table. */
  def ewmaAnomaly(spark: SparkSession, dir: String): DataFrame =
    ewmaHourly(spark, dir)
      .filter(abs(col("cnt") - col("ewma")) > col("ewma") * 0.5)
      .select(col("event_type"), col("hour_ts"), col("cnt"), col("ewma"))
      .orderBy("event_type", "hour_ts")

  /** Top-3 events by value per type, computed with the typed
    * `TopKAggregator` UDAF instead of a window: partitions fold rows
    * into O(k) buffers (map-side combine), k-row partials merge through
    * the shuffle, and the result explodes back to ranked rows. Same
    * answer as the row_number() formulation (the oracle IS that
    * formulation) with |groups|·k exchange rows instead of per-group
    * sorts — the aggregation-vs-window trade window_topn demonstrates
    * from the other side. */
  def topnAgg(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(3),
      Encoders.product[graft.functions.TopKItem])
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(topk(col("value"), col("event_id")).as("top"))
      .select(col("event_type"), posexplode(col("top.items")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rn"),
        col("col.value").as("value"), col("col.id").as("event_id"))
      .orderBy("event_type", "rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topn_agg" -> topnAgg,
    "ewma_hourly" -> ewmaHourly,
    "ewma_anomaly" -> ewmaAnomaly,
    "cohort_retention" -> cohortRetention,
    "event_transitions" -> eventTransitions,
    "funnel_stages" -> funnelStages,
    "latest_by_key" -> latestByKey,
  )

  val oracle: Map[String, String] = Map(
    "topn_agg" ->
      ("SELECT event_type, CAST(rn AS INT) AS rn, value, event_id FROM " +
        "(SELECT event_type, value, event_id, row_number() OVER " +
        "(PARTITION BY event_type ORDER BY value DESC, event_id) AS rn FROM events) " +
        "WHERE rn <= 3 ORDER BY event_type, rn"),
    "ewma_hourly" ->
      ("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour_ts, count(*) AS cnt, " +
        "epoch_us(date_trunc('hour', ts)) // 3600000000 AS h FROM events GROUP BY 1, 2) " +
        "SELECT a.event_type, a.hour_ts, a.cnt, " +
        "round(sum(b.cnt * pow(0.5, a.h - b.h)) / sum(pow(0.5, a.h - b.h)), 6) AS ewma " +
        "FROM hourly a JOIN hourly b ON a.event_type = b.event_type " +
        "AND b.h BETWEEN a.h - 6 AND a.h " +
        "GROUP BY a.event_type, a.hour_ts, a.cnt ORDER BY a.event_type, a.hour_ts"),
    "ewma_anomaly" ->
      ("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour_ts, count(*) AS cnt, " +
        "epoch_us(date_trunc('hour', ts)) // 3600000000 AS h FROM events GROUP BY 1, 2), " +
        "sm AS (SELECT a.event_type, a.hour_ts, a.cnt, " +
        "round(sum(b.cnt * pow(0.5, a.h - b.h)) / sum(pow(0.5, a.h - b.h)), 6) AS ewma " +
        "FROM hourly a JOIN hourly b ON a.event_type = b.event_type " +
        "AND b.h BETWEEN a.h - 6 AND a.h GROUP BY a.event_type, a.hour_ts, a.cnt) " +
        "SELECT event_type, hour_ts, cnt, ewma FROM sm " +
        "WHERE abs(cnt - ewma) > ewma * 0.5 ORDER BY event_type, hour_ts"),
    "cohort_retention" ->
      ("WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events), " +
        "c AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort FROM ud) " +
        "SELECT cohort, CAST(date_diff('day', cohort, day) AS BIGINT) AS day_offset, " +
        "count(*) AS users FROM c GROUP BY cohort, day_offset ORDER BY cohort, day_offset"),
    "event_transitions" ->
      ("SELECT event_type, next_type, count(*) AS n FROM " +
        "(SELECT event_type, lead(event_type, 1) OVER " +
        "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type FROM events) " +
        "WHERE next_type IS NOT NULL GROUP BY event_type, next_type " +
        "ORDER BY event_type, next_type"),
    "funnel_stages" ->
      ("WITH base AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events), " +
        "v AS (SELECT user_id, min(us) AS vus FROM base WHERE event_type = 'view' GROUP BY user_id), " +
        "c AS (SELECT b.user_id, min(b.us) AS cus FROM base b JOIN v ON b.user_id = v.user_id " +
        "WHERE b.event_type = 'click' AND b.us > v.vus GROUP BY b.user_id), " +
        "p AS (SELECT b.user_id, min(b.us) AS pus FROM base b JOIN c ON b.user_id = c.user_id " +
        "WHERE b.event_type = 'purchase' AND b.us > c.cus GROUP BY b.user_id) " +
        "SELECT u.user_id, " +
        "CAST(CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END AS INT) AS reached_view, " +
        "CAST(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS INT) AS reached_click, " +
        "CAST(CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS INT) AS reached_purchase " +
        "FROM (SELECT DISTINCT user_id FROM base) u " +
        "LEFT JOIN v ON u.user_id = v.user_id " +
        "LEFT JOIN c ON u.user_id = c.user_id " +
        "LEFT JOIN p ON u.user_id = p.user_id ORDER BY u.user_id"),
    "latest_by_key" ->
      ("SELECT user_id, last_us, last_event_id, last_type, n_events FROM " +
        "(SELECT user_id, epoch_us(ts) AS last_us, event_id AS last_event_id, " +
        "event_type AS last_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn, " +
        "count(*) OVER (PARTITION BY user_id) AS n_events FROM events) " +
        "WHERE rn = 1 ORDER BY user_id"),
  )
}
