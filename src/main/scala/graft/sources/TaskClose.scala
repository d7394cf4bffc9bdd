package graft.sources

/** Stream-lifetime helper for lazy per-file decode iterators. */
object TaskClose {

  /** Close `c` when the running Spark task completes — success,
    * failure, OR a partially-consumed iterator (limit/take): the three
    * ways a stream handed to a lazy flatMap iterator escapes its
    * reader's own clean-EOF close. Without this, a corrupt container
    * mid-directory leaks one file descriptor per failed task retry.
    * No-op outside a task (driver-side unit tests close normally). */
  def onTaskDone(c: java.io.Closeable): Unit =
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ =>
        try c.close() catch { case scala.util.control.NonFatal(_) => }
      })
}
