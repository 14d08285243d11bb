package graft.sources

/** Process-private scratch directories (IVF index, stream staging, sink
  * round-trips) that are deleted on JVM exit. Keeping them process-scoped
  * is what makes those operators hermetic — no run can observe another's
  * state — and the exit hook keeps a long-lived session from accreting
  * scratch under java.io.tmpdir. */
object TempDirs {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  sys.addShutdownHook {
    created.forEach { root =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () } // exit-path cleanup is best-effort
    }
  }

  /** Create a fresh temp directory removed on JVM exit. */
  def create(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    created.add(d)
    d.toString
  }
}
