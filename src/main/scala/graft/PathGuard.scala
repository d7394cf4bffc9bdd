package graft

import org.apache.spark.sql.SparkSession

/** Shared self-overwrite guard for append-mode stores (text corpus
  * signatures, media signatures): `mode("overwrite")` deletes target
  * files before the job that READS them runs, so writing a store onto
  * its own input would silently drop all history.
  *
  * Paths are qualified through the Hadoop FileSystem so the guard holds
  * on cluster filesystems (hdfs://, s3a:// — a java.io.File round trip
  * would mangle those), compared by URI ancestry, not substrings
  * (/tmp/a is not an ancestor of /tmp/ab), and local file:// paths are
  * canonicalized so a symlinked outDir cannot slip past (input files
  * via a memoized parent-directory cache — one canonicalization per
  * directory, not one multi-syscall walk per part file; part files are
  * plain files the writer produced, never symlinks).
  */
object PathGuard {

  /** Throws IllegalArgumentException when any of `inputFiles` lives under
    * `outDir`. `what` names the store for the error message. */
  def requireDisjoint(spark: SparkSession, inputFiles: Seq[String],
      outDir: String, what: String): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    def qualified(p: String): java.net.URI = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(hconf).makeQualified(path).toUri
    }
    val outUri = qualified(outDir)
    // outDir is canonicalized in full — it is exactly the side a symlink
    // arrives on (e.g. /tmp -> /private/tmp) and there is only one of it
    val outPath = (if (outUri.getScheme == "file")
        new java.io.File(outUri.getPath).getCanonicalPath
      else outUri.getPath).stripSuffix("/")
    val canonDirCache = scala.collection.mutable.HashMap.empty[String, String]
    def canonPath(u: java.net.URI): String = {
      val p = u.getPath.stripSuffix("/")
      if (u.getScheme != "file") p
      else {
        val f = new java.io.File(p)
        Option(f.getParent) match {
          case None => f.getCanonicalPath.stripSuffix("/")
          case Some(dir) =>
            val cd = canonDirCache.getOrElseUpdate(dir,
              new java.io.File(dir).getCanonicalPath.stripSuffix("/"))
            s"$cd/${f.getName}"
        }
      }
    }
    def underOut(f: String): Boolean = {
      val u = qualified(f)
      u.getScheme == outUri.getScheme &&
        Option(u.getAuthority).getOrElse("") == Option(outUri.getAuthority).getOrElse("") &&
        { val p = canonPath(u); p == outPath || p.startsWith(outPath + "/") }
    }
    require(!inputFiles.exists(underOut),
      s"outDir ($outDir) must not contain the files the $what is read " +
        "from: overwrite would delete the history before the grown " +
        "store is written. Use a fresh outDir per batch.")
  }
}
