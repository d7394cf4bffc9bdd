package graft.operators

/** JVM-wide serialization of the write-once layout protocol shared by
  * the re-layout queries (Relational.layoutOnce, Media.mediaLayoutOnce).
  *
  * The protocol — check done-marker, write the layout, commit the
  * marker — is not atomic on its own: two concurrent FIRST queries for
  * the same layout can interleave so that one reads a half-written
  * directory. The layouts live under a per-JVM temp root, so a single
  * JVM-wide monitor (striped per layout dir) is the whole fix; no
  * cross-process coordination is needed.
  */
private[operators] object LayoutLock {

  /** One lock per layout directory path, so unrelated layouts don't
    * serialize each other; the map itself is the only global point. */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Run `write(dir)` exactly once per JVM for `dir`, committing the
    * done-marker AFTER the write (a crashed write rewrites rather than
    * serving partial files). Returns the layout directory path. */
  def once(dir: java.io.File, mkdirs: Boolean = false)(write: String => Unit): String = {
    val lock = locks.computeIfAbsent(dir.getPath, _ => new Object)
    lock.synchronized {
      val done = new java.io.File(dir, "_graft_layout_done")
      if (!done.exists()) {
        if (mkdirs) dir.mkdirs()
        write(dir.toString)
        done.createNewFile()
        ()
      }
    }
    dir.getPath
  }
}
