package graft

import org.apache.spark.sql.functions._

/** Adversarial-skew stress fixture: the template-document / hot-key shape
  * a real crawl corpus has (one boilerplate template = 20% of documents,
  * one power user = 20% of events), generated here because the driver's
  * testdata is only mildly skewed. Exercises the detect→handle loop the
  * 100 TB design claims:
  *   - dedup_degree_hist DETECTS the hub (one degree bucket holding the
  *     whole template family),
  *   - the CC clustering HANDLES it (one cluster of exactly the family
  *     size, converging in O(log d) contraction rounds, no chaining),
  *   - the salted join rewrite beats the unsalted partitioning measurably
  *     (max partition share collapses from the hot key's 20% to ~1/R of
  *     it) while producing identical results,
  * all within wall-time bounds that a quadratic or driver-bound
  * regression would blow through. */
class AdversarialSkewSpec extends SparkSpec {

  private val SaltR = 8 // mirrors AdvancedSql's salt fan-out

  /** One fixture dir per suite run: documents with a 20% template family,
    * events with a 20% hot user. Written with the driver testdata's exact
    * schemas so the REAL operators run against it unmodified. */
  private lazy val fixtureDir: String = {
    val dir = graft.sources.TempDirs.create("graft_skew_fixture_")
    val template = (1 to 40).map(i => s"boilerplate$i").mkString(" ")
    spark.range(1000)
      .select(col("id").as("doc_id"),
        when(col("id") % 5 === 0, lit(template))
          .otherwise(concat_ws(" ", (0 until 12).map(j =>
            concat(lit(s"u${j}x"), col("id"))): _*)).as("text"),
        lit("en").as("lang"), lit("web").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    spark.range(50000)
      .select(col("id").as("event_id"),
        (lit(java.sql.Timestamp.valueOf("2025-01-01 00:00:00").getTime / 1000) +
          col("id") % 86400).cast("timestamp").as("ts"),
        when(col("id") % 5 === 0, 0L).otherwise(pmod(col("id"), lit(997)) + 1).as("user_id"),
        lit("view").as("event_type"),
        (col("id") % 100).cast("double").as("value"),
        concat(lit("p"), col("id")).as("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("degree histogram detects the template hub, CC contains it as one exact cluster") {
    val t0 = System.nanoTime()
    val hist = operators.Dedup.dedupDegreeHist(spark, fixtureDir).collect()
    // detect: the 200 template docs form a clique — every member has
    // degree 199, and NOTHING else has a verified duplicate
    val hub = hist.filter(_.getAs[Long]("degree") == 199L)
    assert(hub.length == 1 && hub.head.getAs[Long]("n_nodes") == 200L,
      s"hub signature missing from degree histogram: ${hist.mkString(", ")}")
    assert(hist.length == 1, s"unique docs leaked into the dup graph: ${hist.mkString(", ")}")
    // handle: clustering the hub family converges (O(log d) contraction,
    // not a per-edge chain) and yields ONE cluster of exactly the family
    val clusters = operators.Dedup.dedupClusters(spark, fixtureDir)
      .groupBy("cluster_id").agg(count(lit(1)).as("n")).collect()
    assert(clusters.length == 1 && clusters.head.getAs[Long]("n") == 200L,
      s"template family did not cluster exactly: ${clusters.mkString(", ")}")
    val elapsed = (System.nanoTime() - t0) / 1e9
    // generous wall bound: the clique path is candidate-bounded (~20k
    // pairs); a quadratic corpus-wide or driver-looping regression is
    // minutes, not seconds
    assert(elapsed < 90, f"detect+handle took $elapsed%.1f s on the 1k-doc fixture")
  }

  test("salted partitioning beats unsalted on the hot key and preserves the join result") {
    val ev = sources.Tables.events(spark, fixtureDir)
      .select(col("event_id"), col("user_id"), col("value"))
    def maxShare(parted: org.apache.spark.sql.DataFrame): Double = {
      val counts = parted.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect()
      counts.max.toDouble / counts.sum
    }
    val unsalted = maxShare(ev.repartition(32, col("user_id")))
    val salted = maxShare(
      ev.repartition(32, col("user_id"), pmod(col("event_id"), lit(SaltR))))
    // hot user 0 owns 20% of rows: unsalted, its partition holds ≥20%;
    // salted, the hot key spreads over R shards (~2.5% each + uniform
    // residue). Require a ≥2× reduction — far inside the real gap, far
    // outside noise.
    assert(unsalted >= 0.19, f"fixture lost its hot key: max share $unsalted%.3f")
    assert(salted * 2 < unsalted,
      f"salting did not rebalance: unsalted $unsalted%.3f vs salted $salted%.3f")
    // and the REAL salted operator returns exactly the plain join's answer
    val saltedRows = operators.AdvancedSql.saltedJoin(spark, fixtureDir).collect()
    val dim = ev.select("user_id").distinct()
      .withColumn("tier", pmod(col("user_id"), lit(10)))
    val plainRows = ev.select(col("user_id"), col("value").cast("decimal(18,2)").as("v"))
      .join(dim, "user_id")
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("total_value"))
      .orderBy("tier").collect()
    assert(saltedRows.map(_.toString).toSeq == plainRows.map(_.toString).toSeq,
      "salted join diverged from the unsalted reference on the skew fixture")
  }
}
