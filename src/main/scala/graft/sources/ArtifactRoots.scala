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
  * a `.build` staging child and are `ATOMIC_MOVE`d into place, then a
  * `.complete` marker file is created LAST. Creation of the `.build` dir
  * itself is the mutual-exclusion claim (`Files.createDirectory` is
  * atomic on POSIX): of N concurrent builders exactly one proceeds; the
  * losers wait for the winner's marker and read the result. A crash
  * mid-build leaves a root without a marker — unreadable by protocol,
  * never half-read.
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

  /** Root directory for artifact `kind` trained on the dataset at `dir`:
    * `<sharedRoot>/<kind>/<fingerprint(dir)>` when a shared root is
    * configured (durable, collision-free, staleness-free by key), else a
    * fresh process-private temp dir (the caller's memo provides the
    * per-process dedup in that case). */
  def rootFor(spark: SparkSession, kind: String, dir: String): String =
    configured(spark) match {
      case Some(shared) =>
        val p = java.nio.file.Paths.get(shared, kind, DatasetId.fingerprint(dir))
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
    write(stage.toString)
    parts.foreach { p =>
      java.nio.file.Files.move(stage.resolve(p),
        java.nio.file.Paths.get(root, p),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    java.nio.file.Files.delete(stage)
    java.nio.file.Files.createFile(marker)
    root
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
