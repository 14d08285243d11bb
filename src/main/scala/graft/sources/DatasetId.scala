package graft.sources

/** Content identity for a dataset directory, used to key per-process
  * memoized stages (Dedup.chainMemo, Similarity.pairsMemo/indexMemo).
  * Keying by path alone serves stale results if the directory is
  * regenerated in-process (same path, new files); folding the listing's
  * (name, length, mtime) triples into the key makes regeneration a cache
  * miss without reading any data. mtime granularity is filesystem-level
  * (ms on ext4) — fine for "a rewrite happened", not a content hash.
  */
object DatasetId {

  def fingerprint(dir: String): String = {
    val f = new java.io.File(dir)
    val entries = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq(f))
      .sortBy(_.getName)
      .map(e => s"${e.getName}:${e.length}:${e.lastModified}")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(entries.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** The memo key for `dir`: path + listing fingerprint. */
  def key(dir: String): String = s"$dir@${fingerprint(dir)}"
}
