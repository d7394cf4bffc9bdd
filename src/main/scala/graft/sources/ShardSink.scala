package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

/** The shared scaffold of every container sink here (Avro, WARC, tar,
  * ZIP): one output file per input partition, written executor-side —
  * write parallelism is the upstream partitioning, no driver funnel.
  *
  * On a mid-write failure the PARTIAL file is deleted before the task
  * error propagates: Spark will retry the task (fs.create overwrites),
  * but between the failure and the retry — or after job abort — a
  * half-written container must not sit in the output directory looking
  * like data (these formats fail loudly at read time, but a quarantine
  * read would mis-blame the producer for what was a writer crash). */
object ShardSink {

  def writeShards(df: DataFrame, path: String, fileName: Int => String)(
      write: (Int, Iterator[Row], java.io.OutputStream) => Unit): Unit = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val file = new org.apache.hadoop.fs.Path(path, fileName(pid))
      val fs = file.getFileSystem(hconf.value)
      val os = fs.create(file, /*overwrite=*/ true)
      try {
        try write(pid, rows, os) finally os.close()
      } catch {
        case t: Throwable =>
          try fs.delete(file, false)
          catch { case scala.util.control.NonFatal(_) => }
          throw t
      }
      Iterator.empty: Iterator[Int]
    }.count()
    ()
  }

  /** [[writeShards]] with a sidecar file per shard (a record index, a
    * manifest, ...). The sidecar is created alongside the data file and
    * BOTH are deleted on a mid-write failure — a data file without its
    * sidecar (or the reverse) must never sit in the output directory
    * looking complete. */
  def writeShardsWithSidecar(df: DataFrame, path: String,
      fileName: Int => String, sidecarName: Int => String)(
      write: (Int, Iterator[Row], java.io.OutputStream, java.io.OutputStream) => Unit): Unit = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val file = new org.apache.hadoop.fs.Path(path, fileName(pid))
      val side = new org.apache.hadoop.fs.Path(path, sidecarName(pid))
      val fs = file.getFileSystem(hconf.value)
      val os = fs.create(file, /*overwrite=*/ true)
      try {
        val ss = fs.create(side, /*overwrite=*/ true)
        try {
          try write(pid, rows, os, ss) finally { ss.close(); os.close() }
        } catch {
          case t: Throwable =>
            try fs.delete(side, false)
            catch { case scala.util.control.NonFatal(_) => }
            throw t
        }
      } catch {
        case t: Throwable =>
          try fs.delete(file, false)
          catch { case scala.util.control.NonFatal(_) => }
          throw t
      }
      Iterator.empty: Iterator[Int]
    }.count()
    ()
  }
}
