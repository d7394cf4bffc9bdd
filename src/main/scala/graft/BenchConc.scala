package graft
import java.util.concurrent.{Executors, TimeUnit}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.SparkSession

/** Scratch: concurrent-wall-only bench for r17 A/B experiments. */
object BenchConc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    def runOne(name: String): Unit =
      try { SparkEntry.queries(name)(spark, sfDir).count(); () }
      catch { case e: Throwable => System.err.println(s"[bc] $name failed: ${e.getMessage}") }
    names.foreach(runOne) // warmup
    val pool = Executors.newFixedThreadPool(24)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      Await.result(Future.sequence(names.map(n => Future(runOne(n)))), Duration.Inf)
      println(f"[bc] concurrent pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    pool.shutdown(); pool.awaitTermination(10, TimeUnit.SECONDS)
    spark.stop()
  }
}
