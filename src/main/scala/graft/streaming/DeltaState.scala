package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded per-trigger delta-dir state for the foreachBatch ingest twins
  * (the setsim and substring screens).
  *
  * The r15 shape wrote one delta dir per trigger (`d<batchId>`, overwrite —
  * retry-idempotent, O(batch) written per trigger) and READ the union
  * `d0..d<batchId-1>` on every trigger. O(batch) written is right;
  * O(triggers) dirs read is not: a long-running ingest pays file-listing +
  * plan growth per trigger forever — fine at 5 triggers, the wrong shape at
  * 10⁴. This helper folds the accumulated deltas into a snapshot dir every
  * `k` triggers (`spark.graft.streamStateFoldK`, default 4), so a trigger
  * reads O(snapshot + k) dirs regardless of stream age.
  *
  * '''Retry discipline''' (the twins' overwrite-by-batchId contract,
  * extended): the fold for base `b` runs on trigger `b` and is a
  * DETERMINISTIC function of `b` — snapshot(b) = snapshot(b−k) ∪
  * deltas[b−k, b), written `mode(overwrite)` — so a retried trigger
  * rebuilds the identical snapshot. Pruning keeps everything a retry of
  * the CURRENT batch can read: after publishing snapshot(b), only dirs
  * strictly older than snapshot(b−k)'s inputs are deleted (deltas < b−k
  * and snapshots < b−k). Structured streaming re-runs at most the last
  * uncommitted batch, so nothing older is ever read again.
  *
  * '''Bound''': at any trigger the state root holds ≤ 2 snapshots +
  * ≤ 2k delta dirs.
  */
private[graft] object DeltaState {

  /** Resolve the fold period ONCE, before the stream starts: the dir
    * layout is a function of K, so a mid-stream K change would make a
    * later fold read a snapshot base that was never written (read
    * failure) or skip deltas it believes were folded (silent loss).
    * The period is therefore PINNED to the state root itself: the first
    * call writes the session-conf value to a `_foldK` marker file under
    * `stateRoot`; every later call — including a checkpoint restart in a
    * fresh session with a different conf — adopts the marker, so the
    * layout stays consistent for the root's lifetime. Callers capture
    * the result outside foreachBatch and close over it. */
  def foldK(session: SparkSession, stateRoot: String): Int = {
    val confK = session.conf.getOption("spark.graft.streamStateFoldK")
      .map(_.toInt).filter(_ >= 1).getOrElse(4)
    val marker = java.nio.file.Paths.get(stateRoot, "_foldK")
    if (java.nio.file.Files.exists(marker)) {
      // marker wins over conf — a restart with a different conf K adopts
      // the layout the root was written under
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt
    } else {
      java.nio.file.Files.createDirectories(marker.getParent)
      // write-then-LINK: the hard link publishes the fully-written value
      // atomically AND fails if a marker already exists (a rename would
      // silently REPLACE an existing target on POSIX, letting a racing
      // pinner overwrite the adopted K), so exactly one pinner wins and
      // every reader sees a complete value
      val tmp = java.nio.file.Paths.get(stateRoot, s"_foldK.tmp${java.util.UUID.randomUUID}")
      java.nio.file.Files.write(tmp,
        confK.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      try java.nio.file.Files.createLink(marker, tmp)
      catch {
        // lost the race to another pinner: adopt theirs below
        case _: java.nio.file.FileAlreadyExistsException => ()
        // filesystem without hard-link support: CREATE_NEW gives the
        // same exactly-one-winner semantics (single write syscall of a
        // tiny value; the partial-read window rename closed is moot at
        // <16 bytes, and the alternative is failing every stream start)
        case _: UnsupportedOperationException =>
          try java.nio.file.Files.write(marker,
            confK.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          catch { case _: java.nio.file.FileAlreadyExistsException => () }
      } finally java.nio.file.Files.deleteIfExists(tmp)
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt
    }
  }

  /** Parquet paths holding the accumulated `prefix`-family state from all
    * triggers before `batchId` (empty on the first trigger). Runs the fold
    * + prune when `batchId` is a fold boundary. `k` is the period
    * captured at stream start ([[foldK]]); `fold` post-processes the
    * snapshot frame before it lands (e.g. `distinct()` for hash-set state,
    * where cross-delta duplicates are semantic no-ops but dead weight). */
  def priorPaths(session: SparkSession, stateRoot: String, prefix: String,
      batchId: Long, k: Int, fold: DataFrame => DataFrame = identity): Seq[String] = {
    val snapBase = (batchId / k) * k
    def snap(base: Long) = s"$stateRoot/s$prefix$base"
    def delta(i: Long) = s"$stateRoot/$prefix$i"
    if (snapBase == 0) return (0L until batchId).map(delta)
    if (batchId == snapBase) {
      val prevBase = snapBase - k
      val inputs =
        (if (prevBase > 0) Seq(snap(prevBase)) else Seq.empty) ++
          (prevBase until snapBase).map(delta)
      fold(session.read.parquet(inputs: _*))
        .write.mode("overwrite").parquet(snap(snapBase))
      // prune what no retry can need: a retry of THIS trigger re-reads
      // snap(prevBase) + deltas[prevBase, snapBase) to rebuild — keep
      // those, drop the FIXED window the previous fold's retention left
      // behind (every fold prunes its own trailing window, so nothing
      // older survives; probing 0..prevBase would be O(triggers²/k)
      // filesystem calls cumulatively). Best-effort: a prune racing a
      // concurrent reader/lister must not fail the trigger.
      (math.max(0L, prevBase - k) until prevBase).foreach(i => best(delta(i)))
      if (prevBase - k > 0) best(snap(prevBase - k))
    }
    Seq(snap(snapBase)) ++ (snapBase until batchId).map(delta)
  }

  private def best(p: String): Unit =
    try graft.sources.ArtifactRoots.deleteRecursively(java.nio.file.Paths.get(p))
    catch { case scala.util.control.NonFatal(_) => () }
}
