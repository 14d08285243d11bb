package graft.sources

/** Unmanaged-memory guardrails for memory-starved executors.
  *
  * Spark's spill machinery bounds MANAGED memory, but two per-file
  * buffer families live outside every pool and scale with spill/write
  * fan-in, which is exactly what explodes when the pool is starved:
  *
  *  - spill READERS: `UnsafeExternalSorter.getSortedIterator` merges
  *    ALL of a task's spill files at once, one `UnsafeSorterSpillReader`
  *    each; with read-ahead enabled every reader allocates two heap
  *    buffers of `spark.unsafe.sorter.spill.reader.buffer.size` (plus a
  *    1 MiB direct NIO buffer). A 6 MiB/slot execution pool turns a
  *    hundred-MiB working set into dozens of spill files per task, and
  *    32 concurrent merges × dozens of files × 2 MiB of heap OOMed the
  *    r18 probe at 4g + memoryFraction 0.05 — inside
  *    `ReadAheadInputStream.<init>`, not in any managed pool.
  *  - parquet WRITERS: one open row-group buffer per running task
  *    ([[ArtifactRoots.boundedBlockBytes]] bounds those).
  *
  * Policy: when the per-slot execution pool is starved (< 16 MiB —
  * only adversarial fractions or drastically oversubscribed executors
  * get there; every production-shaped config clears it by an order of
  * magnitude), disable spill read-ahead so readers keep only their
  * direct NIO buffer, and pin the reader buffer at parquet's 1 MiB
  * floor. Read-ahead is a throughput optimization; under this much
  * pressure the job is spill-bound anyway and surviving beats
  * prefetching. These are SparkConf-level settings (the reader
  * constructor reads `SparkEnv.get().conf()`), so they must be applied
  * at session BUILD time — hence a builder hook, not a runtime set. */
object SpillSafety {
  /** Per-slot execution-pool floor below which the guardrails engage. */
  val StarvedPoolPerSlotBytes: Long = 16L << 20

  /** The conf pairs for a JVM with `heapBytes` max heap, `slots`
    * concurrent tasks, and `memFraction` unified-pool fraction. Empty
    * when the pool is healthy — steady-state bench configs are
    * untouched. Pure, so the policy itself is spec-testable. */
  def starvedSorterConf(heapBytes: Long, slots: Int,
      memFraction: Double): Seq[(String, String)] = {
    val poolPerSlot =
      (heapBytes * memFraction / math.max(1, slots)).toLong
    if (poolPerSlot < StarvedPoolPerSlotBytes)
      Seq("spark.unsafe.sorter.spill.read.ahead.enabled" -> "false",
        "spark.unsafe.sorter.spill.reader.buffer.size" -> (1L << 20).toString)
    else Seq.empty
  }

  /** Apply the policy to a session builder using this JVM's max heap
    * (the executor heap in local mode, where all graft CLIs run). */
  def tune(builder: org.apache.spark.sql.SparkSession.Builder, slots: Int,
      memFraction: Double): org.apache.spark.sql.SparkSession.Builder =
    starvedSorterConf(Runtime.getRuntime.maxMemory(), slots, memFraction)
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
}
