package graft.sources

import org.apache.spark.sql.SparkSession

/** The durable-artifact protocol shared by every persisted pipeline
  * artifact (IVF index, BPE merge table, quality-gate spec): where the
  * artifact lives, how a build lands atomically, and what a reader must
  * check before trusting the files.
  *
  * '''Location.''' By default each artifact builds under a process-private
  * temp dir (hermetic: no run observes another's state, nothing outlives
  * the JVM — the right default for tests and benches). Setting
  * `spark.graft.artifactRoot` (or the `GRAFT_ARTIFACT_ROOT` environment
  * variable) switches to the production layout: a SHARED durable root,
  * with each artifact at `<root>/<kind>/<dataset-fingerprint>` so
  * distinct datasets/params never collide and a regenerated dataset gets
  * a fresh directory rather than a stale reuse. At 100 TB this is the
  * contract that lets a nightly training job build the artifact once and
  * a fleet of serving jobs reload it — the fingerprint in the path is
  * the cache key, the marker below is the visibility barrier.
  *
  * '''Atomic build.''' Writers never mutate the live root: parts land in
  * a `.build` staging child and are `ATOMIC_MOVE`d into place, then the
  * `.complete` marker is created, and only then is the staging claim
  * released. Creation of the `.build` dir itself is the mutual-exclusion
  * claim (`Files.createDirectory` is atomic on POSIX): of N concurrent
  * builders exactly one proceeds; the losers wait for the winner's
  * marker and read the result. The claim outlives the publish on
  * purpose — releasing it before the marker would let a racer re-claim
  * and collide with the published parts. A crash mid-build leaves a
  * root without a marker — unreadable by protocol, never half-read —
  * and an in-process build failure deletes its own claim so the root
  * self-heals instead of deadlocking every future builder.
  *
  * '''Reader check.''' Every consumer calls [[assertComplete]] before
  * reading, so the marker is enforced on BOTH sides of the race, not
  * just documented on the writer side.
  */
object ArtifactRoots {

  /** The configured shared durable root, if any: Spark conf
    * `spark.graft.artifactRoot` wins over env `GRAFT_ARTIFACT_ROOT`;
    * absent both, artifacts stay process-private. */
  def configured(spark: SparkSession): Option[String] =
    spark.conf.getOption("spark.graft.artifactRoot")
      .orElse(sys.env.get("GRAFT_ARTIFACT_ROOT"))
      .filter(_.nonEmpty)

  /** Artifact-format version, part of every shared-root path. Bump it
    * whenever the bytes an artifact builder writes change meaning —
    * training logic, parameters (IvfK, BPE rounds, gate formula), or
    * file layout — so a deployed upgrade builds fresh artifacts instead
    * of silently serving what an older binary left on the durable root
    * (the staleness class the process-private default is immune to by
    * construction). Overridable per session via
    * `spark.graft.artifactVersion` for side-by-side migration tests. */
  private val FormatVersion = 1

  /** Root directory for artifact `kind` trained on the dataset at `dir`:
    * `<sharedRoot>/<kind>/v<version>/<fingerprint(dir)>` when a shared
    * root is configured (durable; collision-free by kind, staleness-free
    * by dataset fingerprint AND format version), else a fresh
    * process-private temp dir (the caller's memo provides the
    * per-process dedup in that case). */
  def rootFor(spark: SparkSession, kind: String, dir: String): String =
    configured(spark) match {
      case Some(shared) =>
        val v = spark.conf.getOption("spark.graft.artifactVersion")
          .getOrElse(FormatVersion.toString)
        val p = java.nio.file.Paths.get(shared, kind, s"v$v",
          DatasetId.fingerprint(dir))
        java.nio.file.Files.createDirectories(p)
        p.toString
      case None => TempDirs.create(s"graft_${kind}_")
    }

  /** Run `write(stagePath)` to produce the artifact's `parts` under the
    * staging dir, then publish them atomically under `root`. Safe against
    * concurrent builders on the same root: exactly one claims the
    * `.build` dir and builds; the rest block until the winner's
    * `.complete` marker appears (bounded wait), then return the built
    * root. Idempotent: a root that already carries the marker returns
    * immediately. Returns `root`. */
  def atomicBuild(root: String, parts: Seq[String])(write: String => Unit): String = {
    val marker = java.nio.file.Paths.get(root, ".complete")
    if (java.nio.file.Files.exists(marker)) return root
    val stage = java.nio.file.Paths.get(root, ".build")
    val claimed =
      try { java.nio.file.Files.createDirectory(stage); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    if (!claimed) { awaitMarker(marker); return root }
    // Re-check after claiming: a winner that finished between our marker
    // check and our claim has deleted its stage, letting us re-create it.
    if (java.nio.file.Files.exists(marker)) {
      java.nio.file.Files.delete(stage); return root
    }
    try {
      // No marker + we hold the claim ⇒ any part dirs under the root are
      // unpublished leftovers (a crashed builder that died between a
      // part move and its cleanup). By protocol they are unreadable, so
      // clear them — otherwise OUR ATOMIC_MOVE below would collide with
      // a stale directory and the root could never be built again.
      parts.foreach(p => deleteRecursively(java.nio.file.Paths.get(root, p)))
      write(stage.toString)
      parts.foreach { p =>
        java.nio.file.Files.move(stage.resolve(p),
          java.nio.file.Paths.get(root, p),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      // Marker BEFORE releasing the stage claim: the claim dir is the
      // mutual exclusion, so it must outlive the publish — deleting it
      // first would open a window where a second builder re-claims,
      // rebuilds, and crashes ATOMIC_MOVE-ing onto the already-published
      // part directories.
      java.nio.file.Files.createFile(marker)
    } catch {
      case e: Throwable =>
        // A failed build must undo everything this ATTEMPT landed — any
        // parts already moved into the root (a failure mid-loop would
        // otherwise strand them and collide with the next attempt's
        // moves) and then the claim itself — or the root is poisoned: on
        // a durable shared root every later builder, including fresh
        // processes, would either block on a marker that never comes or
        // crash on the stale part. Best-effort; the pre-build sweep
        // above is the second line of defence for a hard crash here.
        try {
          parts.foreach(p => deleteRecursively(java.nio.file.Paths.get(root, p)))
          deleteRecursively(stage)
        } catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
    java.nio.file.Files.delete(stage)
    root
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  /** Block until `marker` exists — the loser's half of the builder race.
    * The bound is generous (these builds are seconds, not hours); a
    * production deployment would add lease/heartbeat expiry for crashed
    * winners, which process-private and test roots don't need. */
  private def awaitMarker(marker: java.nio.file.Path): Unit = {
    val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(marker)) {
      if (System.nanoTime() > deadline)
        sys.error(s"timed out waiting for artifact marker $marker " +
          "(concurrent builder crashed mid-build?)")
      Thread.sleep(50)
    }
  }

  /** Reader-side protocol check: the artifact at `root` must carry the
    * `.complete` marker. Failing loudly here is what makes a killed
    * build "unreadable rather than half-read" — without this, the
    * marker protects only the writer side of the race. Returns `root`
    * so call sites compose: `read.parquet(s"${assertComplete(r)}/part")`. */
  def assertComplete(root: String): String = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(root, ".complete")))
      sys.error(s"artifact root $root has no .complete marker — " +
        "refusing to read a possibly half-built artifact")
    root
  }
}
