package graft
import java.util.concurrent.{Executors, TimeUnit}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.SparkSession

/** Scratch: measures the pure dispatch floor of N trivial queries under
  * the bench's 24-thread concurrent protocol. */
object ConcFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def one(i: Int): Unit = {
      spark.range(0L, 5000000L, 1L, 8).selectExpr("sum(id * 3 + 1)").collect(); ()
    }
    (1 to 20).foreach(one) // warmup
    val pool = Executors.newFixedThreadPool(24)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    (1 to 3).foreach { p =>
      val t0 = System.nanoTime()
      Await.result(Future.sequence((1 to 249).map(i => Future(one(i)))), Duration.Inf)
      println(f"[floor] 249 trivial queries, 24 threads: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // with one shuffle each
    def shuffled(i: Int): Unit = {
      spark.range(0L, 100000L, 1L, 8).selectExpr("id % 97 as k", "id as v")
        .groupBy("k").sum("v").collect(); ()
    }
    (1 to 20).foreach(shuffled)
    (1 to 3).foreach { p =>
      val t0 = System.nanoTime()
      Await.result(Future.sequence((1 to 249).map(i => Future(shuffled(i)))), Duration.Inf)
      println(f"[floor] 249 one-shuffle queries, 24 threads: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    pool.shutdown(); pool.awaitTermination(5, TimeUnit.SECONDS)
    spark.stop()
  }
}
