package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The failure-visibility contract of the correctness dump (round-7
  * lesson): a query that throws must leave `<out>/<name>._error` plus an
  * `errors.json` row, never a silent omission, while healthy queries in
  * the same run still dump normally. */
class VerifySpec extends SparkSpecBase {

  test("a broken query leaves explicit error artifacts; healthy ones dump") {
    val out = Files.createTempDirectory("graft_verify").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "healthy" -> ((s, d) => Tables.region(s, d)),
      "broken_analysis" -> ((s, d) =>
        Tables.region(s, d).selectExpr("no_such_column + 1")),
      "broken_runtime" -> ((s, _) => {
        import s.implicits._
        Seq(1, 0).toDF("x").selectExpr("10 / x AS y").filter($"y".isNotNull)
          .selectExpr("assert_true(y < 6, 'boom') AS z", "y")
      }))
    val oracle = Map("healthy" -> "SELECT 1", "broken_analysis" -> "SELECT 2",
      "broken_runtime" -> "SELECT 3")
    val errors = Verify.run(spark, sf(), out, queries, oracle)
    assert(errors.keySet == Set("broken_analysis", "broken_runtime"))
    // explicit artifacts for the failures
    assert(Files.exists(Paths.get(out, "broken_analysis._error")))
    assert(Files.exists(Paths.get(out, "broken_runtime._error")))
    val msg = Files.readString(Paths.get(out, "broken_analysis._error"))
    assert(msg.toLowerCase.contains("no_such_column"))
    // errors.json parses and carries both names (tools/check.py reads it)
    val ej = Files.readString(Paths.get(out, "errors.json"))
    assert(ej.contains("broken_analysis") && ej.contains("broken_runtime"))
    // the healthy query still dumped parquet alongside the failures
    assert(spark.read.parquet(s"$out/healthy").count() == 5)
    assert(Files.exists(Paths.get(out, "oracle_sql.json")))
  }
}
