package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Relational, TimeSeries, Windows}

/** Cross-checks for the second round-9 signal/navigation batch: each
  * judged decomposition is replayed against the naive formulation it
  * replaces (brute-force split search, window-based as-of, per-frame
  * collect_set) on sf0.001. */
class Signal2Spec extends SparkSpecBase {
  import spark.implicits._

  test("ts_changepoint matches the O(n^2) brute-force split search") {
    val daily = Tables.events(spark, sf())
      .groupBy($"user_id", $"ts".cast("date").as("day"))
      .agg(sum($"value").as("x"))
      .select($"user_id", $"day".cast("string"), $"x")
      .as[(Long, String, Double)].collect()
    val expect = daily.groupBy(_._1).map { case (u, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val days = rows.sortBy(_._2).map(_._2)
      val n = xs.length
      // brute force: recompute both means per split, no cumsum trick
      val best = (1 until n).map { i =>
        val pre = xs.take(i); val post = xs.drop(i)
        (math.abs(pre.sum / i - post.sum / (n - i)), days(i - 1), i)
      }.maxBy(s => (s._1, s._2)) // ties -> later day, mirroring day DESC rank
      u -> (best._2, best._3)
    }
    val got = TimeSeries.tsChangepoint(spark, sf())
      .select($"user_id", $"split_day".cast("date").cast("string"), $"i_days")
      .as[(Long, String, Long)].collect()
    got.foreach { case (u, day, i) =>
      val (eday, ei) = expect(u)
      assert(day == eday && i == ei, s"user $u: got ($day,$i) want ($eday,$ei)")
    }
    assert(got.length == expect.size)
  }

  test("join_asof_forward matches the window next-click formulation") {
    val e = Tables.events(spark, sf())
    // independent formulation: union both streams, per-user ordered
    // window carrying the NEXT click id/time onto each purchase
    val tagged = e.filter($"event_type".isin("purchase", "click"))
      .select($"user_id", unix_micros($"ts").as("um"), $"event_id",
        ($"event_type" === "click").as("is_click"))
    val w = Window.partitionBy($"user_id").orderBy($"um".desc, $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // walking time DESC, the "last click seen so far" among rows after
    // this one IS the next click at-or-after in time order; um ties
    // cannot occur ((user_id, ts) unique)
    val want = tagged
      .withColumn("click_id", last(when($"is_click", $"event_id"), ignoreNulls = true).over(w))
      .withColumn("c_um", last(when($"is_click", $"um"), ignoreNulls = true).over(w))
      .filter(!$"is_click")
      .select($"event_id".as("purchase_id"), $"user_id", $"click_id",
        ($"c_um" - $"um").as("wait_us"))
    val got = Relational.joinAsofForward(spark, sf())
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("win_running_distinct matches collect_set over the running frame") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = Tables.events(spark, sf())
      .filter($"user_id" < 8)
      .select($"event_id",
        size(collect_set($"event_type").over(w)).cast("long").as("types_seen"))
    val got = Windows.winRunningDistinct(spark, sf())
      .select($"event_id", $"types_seen")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("madAnomaly flags only the >3.5-MAD spike, score exact on the lattice") {
    // cents 100,102,104,106,200: median 104 → m2=208; dev2 = 8,4,0,4,192
    // → mad4 = 2·median(dev2) = 8; gate 4·dev2 > 7·8 flags only 192;
    // score = 2·192/8 = 48 exactly
    val df = Seq((9L, 1L, 1.00), (9L, 2L, 1.02), (9L, 3L, 1.04),
      (9L, 4L, 1.06), (9L, 5L, 2.00))
      .toDF("user_id", "event_id", "value")
    val got = graft.operators.TimeSeries.madAnomaly(df).collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 5L && got.head.getDouble(2) == 2.00
      && got.head.getDouble(3) == 48.0)
    // a constant series (mad4 = 0) flags nothing — by definition, not error
    val const = Seq((8L, 1L, 5.0), (8L, 2L, 5.0), (8L, 3L, 5.0))
      .toDF("user_id", "event_id", "value")
    assert(graft.operators.TimeSeries.madAnomaly(const).count() == 0)
  }

  test("sax: PAA segments, quartile symbols, partial tail dropped") {
    // 25 samples: seg0 = ten 1.00s (paa 1000), seg1 = ten 3.00s (paa
    // 3000), 5-sample tail dropped; quartiles of {1000, 3000} put seg0
    // in 'a' and seg1 in 'd'
    val rows = (1 to 10).map(i => (9L, i.toLong, 1.00)) ++
      (11 to 20).map(i => (9L, i.toLong, 3.00)) ++
      (21 to 25).map(i => (9L, i.toLong, 2.00))
    val dir = java.nio.file.Files.createTempDirectory("sax").toString
    rows.toDF("user_id", "event_id", "value")
      .withColumn("ts", timestamp_seconds($"event_id"))
      .withColumn("event_type", lit("t")).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir + "/events.parquet")
    val got = graft.operators.TimeSeries.tsSax(spark, dir).collect()
    assert(got.length == 2, "partial tail segment must be dropped")
    assert(got(0).getLong(1) == 0L && got(0).getLong(2) == 1000L
      && got(0).getString(3) == "a")
    assert(got(1).getLong(1) == 1L && got(1).getLong(2) == 3000L
      && got(1).getString(3) == "d")
  }

  test("dow profile: epoch-day dow, multi-day cells, integer index round") {
    // 2024-01-01/08 are Mondays (dow 1), 2024-01-02 a Tuesday (dow 2).
    // Monday day-sums 100+300 over 2 days, Tuesday 400 over 1 day;
    // overall 800 cents / 3 days → idx Mon = 10000·(400/2)/(800/3) =
    // 7500, Tue = 15000 — both exact integer rationals
    val rows = Seq((1L, "2024-01-01 09:00:00", 1.00),
      (2L, "2024-01-08 09:00:00", 3.00), (3L, "2024-01-02 09:00:00", 4.00))
    val dir = java.nio.file.Files.createTempDirectory("dow").toString
    rows.toDF("event_id", "tss", "value")
      .withColumn("ts", to_timestamp($"tss")).drop("tss")
      .withColumn("user_id", lit(5L))
      .withColumn("event_type", lit("t")).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir + "/events.parquet")
    val got = graft.operators.TimeSeries.tsDowProfile(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(1L -> ((2L, 400L, 7500L)), 2L -> ((1L, 400L, 15000L))))
  }

  test("multires: one pass emits consistent day/week/month cells") {
    // user 5's four events: two on Mon 2024-01-01, one on Tue
    // 2024-01-02 (same ISO week), one on Mon 2024-01-08 (next week,
    // same month) — 3 day cells, 2 week cells, 1 month cell, and each
    // grain's totals must re-aggregate to the same sum
    val rows = Seq((1L, "2024-01-01 09:00:00", 1.00),
      (2L, "2024-01-01 10:00:00", 2.00), (3L, "2024-01-02 09:00:00", 4.00),
      (4L, "2024-01-08 09:00:00", 8.00))
    val dir = java.nio.file.Files.createTempDirectory("mres").toString
    rows.toDF("event_id", "tss", "value")
      .withColumn("ts", to_timestamp($"tss")).drop("tss")
      .withColumn("user_id", lit(4L))
      .withColumn("event_type", lit("t")).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir + "/events.parquet")
    val got = TimeSeries.tsMultires(spark, dir).collect()
      .map(r => (r.getString(1),
        r.getAs[java.time.LocalDateTime](2).toLocalDate.toString,
        r.getLong(3), r.getLong(4)))
    assert(got.count(_._1 == "day") == 3)
    assert(got.count(_._1 == "week") == 2)
    assert(got.count(_._1 == "month") == 1)
    assert(got.filter(_._1 == "day").map(_._4).sum == 1500L)
    assert(got.contains(("week", "2024-01-01", 3L, 700L)))
    assert(got.contains(("week", "2024-01-08", 1L, 800L)))
    assert(got.contains(("month", "2024-01-01", 4L, 1500L)))
  }

  test("mse: tau-sum lattice, scaled tolerance, short scales drop out") {
    // 8 samples alternating 10.00/30.00 in pairs: every τ=1 pair is
    // within the 20.00 tolerance (B=A=21, sampen 0), τ=2 sums alternate
    // 2000/6000 exactly ON the scaled tolerance (B=A=3, sampen 0 — and
    // the A==B case exercises the −0.0 normalization), τ=4 leaves one
    // template → no pairs → no row
    val vals = Seq(10.00, 10.00, 30.00, 30.00, 10.00, 10.00, 30.00, 30.00)
    val dir = java.nio.file.Files.createTempDirectory("mse").toString
    vals.zipWithIndex.map { case (v, i) => (i.toLong + 1, v) }
      .toDF("event_id", "value")
      .withColumn("ts", timestamp_seconds($"event_id"))
      .withColumn("user_id", lit(6L))
      .withColumn("event_type", lit("t")).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir + "/events.parquet")
    val got = graft.operators.TrainingData.hrvMse(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got == Map(1L -> ((21L, 21L, 0.0)), 2L -> ((3L, 3L, 0.0))))
  }

  test("ts_time_weighted_avg: constant series TWA equals the constant") {
    val out = TimeSeries.tsTimeWeightedAvg(spark, sf()).collect()
    // invariant holds trivially only for synthetic constants; on real
    // data assert the algebraic bound: min(value) <= twa <= max(value)
    val bounds = Tables.events(spark, sf())
      .groupBy($"user_id")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    out.foreach { r =>
      val (lo, hi) = bounds(r.getLong(0))
      val twa = r.getDouble(1)
      assert(twa >= lo - 1e-9 && twa <= hi + 1e-9,
        s"user ${r.getLong(0)}: twa $twa outside [$lo, $hi]")
    }
  }
}
