package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-frame edge semantics on tiny hand-built fixtures
  * (SURVEY.md §5.2): partition-first lag, rank ties, last_value frame,
  * moving-average ramp-up, time-range frame boundaries. */
class WindowEdgeSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val ev = Seq(
    // (user_id, event_id, seconds, value)
    (1L, 10L, 0L, 1.0),
    (1L, 11L, 300L, 2.0),
    (1L, 12L, 601L, 4.0),   // 601s after event 10 → outside its 10-min window
    (2L, 20L, 0L, 10.0)
  ).toDF("user_id", "event_id", "sec", "value")
    .withColumn("ts", timestamp_seconds(col("sec")))

  test("lag is null on the first row of each partition") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val dv = ev.select($"event_id", ($"value" - lag($"value", 1).over(w)).as("dv"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(dv(10L) == null && dv(20L) == null)
    assert(dv(11L) == 1.0 && dv(12L) == 2.0)
  }

  test("rank leaves gaps on ties, dense_rank does not") {
    val df = Seq(("a", 5), ("b", 5), ("c", 3)).toDF("k", "v")
    val w = Window.orderBy($"v".desc)
    val got = df.select($"k", rank().over(w).as("r"), dense_rank().over(w).as("dr"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set(("a", 1, 1), ("b", 1, 1), ("c", 3, 2)))
  }

  test("last_value needs the full frame; default frame stops at current row") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val r = ev.filter($"user_id" === 1)
      .select($"event_id",
        last($"value").over(w).as("curr"),
        last($"value").over(wFull).as("full"))
      .orderBy($"event_id").collect()
    assert(r.map(_.getDouble(1)).toSeq == Seq(1.0, 2.0, 4.0)) // runs with the row
    assert(r.map(_.getDouble(2)).toSeq == Seq(4.0, 4.0, 4.0)) // true partition last
  }

  test("5-row moving average ramps up at partition start") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id").rowsBetween(-4, 0)
    val r = ev.filter($"user_id" === 1)
      .select(avg($"value").over(w).as("ma")).orderBy($"ma").collect().map(_.getDouble(0))
    assert(r.toSeq == Seq(1.0, 1.5, 7.0 / 3))
  }

  test("10-minute range frame includes the boundary and excludes beyond it") {
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-600000000L, 0)
    val c = ev.select($"event_id", count(lit(1)).over(w).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c(10L) == 1)
    assert(c(11L) == 2) // 300s back: inside
    assert(c(12L) == 2) // event 10 is 601s back: outside; event 11 301s back: inside
    assert(c(20L) == 1)
  }

  test("composed EXCLUDE CURRENT ROW equals full-frame aggregate minus self") {
    // cents 100, 200, 400 over a ±1 frame: excluded sums 2.0 / 5.0 / 2.0,
    // LOO means 2.0 / 2.5 / 2.0 — the win_frame_exclude recipe hand-checked
    val df = Seq((9L, 1L, 1.00), (9L, 2L, 2.00), (9L, 3L, 4.00))
      .toDF("user_id", "event_id", "value")
    val c = round($"value" * 100).cast("long")
    val got = df.select($"event_id", c.as("c"))
      .withColumn("s", sum($"c").over(
        Window.partitionBy(lit(1)).orderBy($"event_id").rowsBetween(-1, 1)) - $"c")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 200L && got(2L) == 500L && got(3L) == 200L)
    val judged = graft.operators.Windows.winFrameExclude(spark, sf())
      .filter($"n_excl" > 0).limit(50).collect()
    // n_excl is the frame count minus the row itself — never negative,
    // and the LOO mean times n equals the excluded sum on the 4-dp grid
    assert(judged.forall(r => r.getLong(2) >= 1))
    assert(judged.forall { r =>
      math.abs(r.getDouble(4) * r.getLong(2) - r.getDouble(3)) <= 0.01 * r.getLong(2)
    })
  }

  test("frame DISTINCT: composed array_distinct equals running variety") {
    // types a,a,b,a,c under a trailing all-rows frame → distinct counts
    // 1,1,2,2,3 while the frame count runs 1..5
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a"), (5L, "c"))
    val dir = java.nio.file.Files.createTempDirectory("wdf").toString
    rows.toDF("event_id", "event_type")
      .withColumn("ts", timestamp_seconds($"event_id"))
      .withColumn("user_id", lit(3L))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir + "/events.parquet")
    val got = graft.operators.Windows.winDistinctFrame(spark, dir)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 3L)))
  }

  test("GROUPS frame: adjacent-day peer groups, uneven rows per day") {
    // one user, three days with 2/1/2 rows — cents per day 300/400/2400.
    // GROUPS ±1: day1 rows → 700, day2 row → 3100, day3 rows → 2800;
    // every row of a day gets its day's GROUP total, not a ROWS slice
    val rows = Seq((1L, "2024-03-01 10:00:00", 1.00),
      (2L, "2024-03-01 11:00:00", 2.00), (3L, "2024-03-02 10:00:00", 4.00),
      (4L, "2024-03-03 10:00:00", 8.00), (5L, "2024-03-03 11:00:00", 16.00))
    val dir = java.nio.file.Files.createTempDirectory("wfg").toString
    rows.toDF("event_id", "tss", "value")
      .withColumn("ts", to_timestamp($"tss")).drop("tss")
      .withColumn("user_id", lit(7L))
      .withColumn("event_type", lit("t")).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir + "/events.parquet")
    val got = graft.operators.Windows.winFrameGroups(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 700L, 2L -> 700L, 3L -> 3100L,
      4L -> 2800L, 5L -> 2800L))
  }
}
