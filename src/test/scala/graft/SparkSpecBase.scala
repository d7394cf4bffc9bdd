package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for all suites (getOrCreate reuses the
  * first one created in the test JVM). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // managed tables (LayoutSpec's bucketed saves) land in a throwaway
    // warehouse, not ./spark-warehouse inside the repo
    .config("spark.sql.warehouse.dir", SparkSpecBase.warehouseDir)
    .getOrCreate()

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkSpecBase {
  // one temp warehouse per JVM — getOrCreate only honors the config on
  // the first session anyway, so per-suite temp dirs would just strand
  // empty directories
  lazy val warehouseDir: String =
    java.nio.file.Files.createTempDirectory("graft_wh").toString
}
