package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Each query is executed through `write.format("noop")` — a real action
  * that materializes every output row through the complete physical plan
  * (a bare `.count()` would let Catalyst prune final sorts/projections and
  * under-measure).
  */
object Bench {

  /** Cumulative JVM GC milliseconds across all collectors. */
  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  /** Process CPU nanoseconds (−1 if the platform bean is unavailable). */
  private def cpuNanos: Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: absorb one-time init (FS, codegen, committers) so it
    // isn't billed to whichever query happens to run first
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val names = selected.map(_._1).toSet
    val gc0 = gcMillis
    val cpu0 = cpuNanos
    // Shared-stage builds, billed explicitly: the dedup chain, ANN pair,
    // and IVF index stages are memoized across queries, so without this
    // the whole build cost lands on whichever consumer runs first
    // (alphabetical order) and per-query numbers aren't comparable across
    // rounds. Each build below is timed as its own `chain_*` entry (still
    // part of `total`); the per-query entries then measure marginal cost.
    val chainDefs: Seq[(String, Set[String], () => Unit)] = Seq(
      ("chain_dedup_verified",
        Set("dedup_minhash_lsh", "dedup_verify_candidates", "dedup_clusters", "dedup_apply"),
        () => { operators.Dedup.verifiedCandidates(spark, sfDir).count(); () }),
      ("chain_dedup_clusters", Set("dedup_clusters", "dedup_apply"),
        () => { operators.Dedup.clusterLabels(spark, sfDir).count(); () }),
      ("chain_ann_pairs", Set("ann_lsh_pairs", "dedup_embedding"),
        () => { operators.Similarity.scoredLshPairs(spark, sfDir).count(); () }),
      ("chain_ivf_index", Set("ivf_assign", "ivf_search"),
        () => { operators.Similarity.ivfWarmIndex(spark, sfDir); () }),
    )
    val chainResults = chainDefs.collect {
      case (label, consumers, build) if consumers.exists(names.contains) =>
        val t0 = System.nanoTime()
        build()
        label -> (System.nanoTime() - t0) / 1e9
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // -1 sentinel: a throwing query must be unmistakable in the JSON,
      // not silently billed a normal-looking duration
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = (chainResults ++ results).map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = (chainResults ++ results).map(_._2).filter(_ >= 0).sum
    // Self-diagnosing telemetry: wall time alone can't distinguish a slow
    // plan from a contended machine (BENCH_r02 ran 6x slow on an otherwise
    // unchanged commit). gc_s is this JVM's collector time over the run;
    // cpu_s is this process's CPU seconds (>> 32x wall means external
    // contention is unlikely; << wall x parallelism means we were starved);
    // load_avg is the 1-minute system load at exit.
    val gcS = (gcMillis - gc0) / 1e3
    val cpuS = if (cpu0 >= 0) (cpuNanos - cpu0) / 1e9 else -1.0
    val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"gc_s":$gcS,"cpu_s":$cpuS,"load_avg":$load,"sf":"$sfDir"}""")
    spark.stop()
  }
}
