package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Hrv, TimeSeries, TrainingData}

/** Round-9 signal-analysis queries (#92 ts_ewma, #93 ts_anomaly_zscore,
  * #94 hrv_band_power): each cross-checked against the sequential /
  * textbook formulation the distributed form decomposes, plus the
  * boundary invariants the judged artifacts rely on. */
class SignalSpec extends SparkSpecBase {
  import spark.implicits._

  test("ts_ewma equals the driver-side sequential recurrence") {
    // the judged query computes EWMA via the parallel-prefix form;
    // replay the plain s_i = x_i/3 + 2*s_{i-1}/3 recurrence per user on
    // the collected daily sums and compare at the judged rounding
    val daily = Tables.events(spark, sf())
      .groupBy($"user_id", $"ts".cast("date").as("day"))
      .agg(sum($"value").as("x"))
      .orderBy($"user_id", $"day")
      .select($"user_id", $"day".cast("string"), $"x")
      .as[(Long, String, Double)].collect()
    val expect = daily.groupBy(_._1).iterator.flatMap { case (u, rows) =>
      var s = 0.0
      rows.sortBy(_._2).zipWithIndex.map { case ((_, day, x), i) =>
        s = if (i == 0) x else x * (1.0 / 3) + s * (2.0 / 3)
        ((u, day), BigDecimal(s).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toMap
    val got = TimeSeries.tsEwma(spark, sf())
      .select($"user_id", $"day".cast("date").cast("string"), $"ewma")
      .as[(Long, String, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (u, day, e) =>
      // prefix form vs recurrence differ only in float association;
      // both land on the same 2-dp value (boundary margin ≥1.4e-5)
      assert(math.abs(e - expect((u, day))) < 1e-9,
        s"user $u day $day: prefix=$e recurrence=${expect((u, day))}")
    }
  }

  test("ts_anomaly_zscore: every kept row's z is honest against its frame") {
    val out = TimeSeries.tsAnomalyZscore(spark, sf()).collect()
    assert(out.nonEmpty)
    // |rounded z| must exceed 2 (the raw cutoff is exclusive; rounding
    // can only move ±0.005)
    out.foreach(r => assert(math.abs(r.getDouble(4)) >= 2.0 - 0.005))
    // spot-check one row end-to-end against a hand computation
    val ev = Tables.events(spark, sf())
      .select($"event_id", $"user_id", unix_micros($"ts").as("tm"), $"value")
      .as[(Long, Long, Long, Double)].collect()
    val byUser = ev.groupBy(_._2).map { case (u, rows) =>
      u -> rows.sortBy(r => (r._3, r._1))
    }
    val probe = out.head
    val (pid, puser) = (probe.getLong(0), probe.getLong(1))
    val series = byUser(puser)
    val idx = series.indexWhere(_._1 == pid)
    val frame = series.slice(math.max(0, idx - 20), idx).map(_._4)
    val mu = frame.sum / frame.length
    val sd = math.sqrt(frame.map(v => (v - mu) * (v - mu)).sum / (frame.length - 1))
    val z = (series(idx)._4 - mu) / sd
    assert(math.abs(z) > 2)
    assert(math.abs(BigDecimal(z).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      - probe.getDouble(4)) < 1e-9)
  }

  test("bandPower: constant signal has zero power at every frequency") {
    val df = (0 until 64).map(i => ("k", i.toLong * 1000000L, 42.0))
      .toDF("k", "tm", "v")
      .select($"k", timestamp_micros($"tm").as("ts"), $"v")
    val p = Hrv.bandPower(df, $"k", $"ts", $"v", Seq(0.01, 0.1)).collect().head
    assert(math.abs(p.getDouble(1)) < 1e-18 && math.abs(p.getDouble(2)) < 1e-18)
  }

  test("bandPower: a pure tone concentrates power at its own frequency") {
    // 256 samples at 1 Hz of sin(2π·0.125·t): power at 0.125 Hz ≈ A²n/4,
    // power at an off frequency ≈ 0
    val n = 256
    val f = 0.125
    val df = (0 until n).map { i =>
      ("k", i.toLong * 1000000L, math.sin(2 * math.Pi * f * i))
    }.toDF("k", "tm", "v")
      .select($"k", timestamp_micros($"tm").as("ts"), $"v")
    val p = Hrv.bandPower(df, $"k", $"ts", $"v", Seq(f, 0.37)).collect().head
    val atTone = p.getDouble(1)
    val off = p.getDouble(2)
    assert(math.abs(atTone - n / 4.0) / (n / 4.0) < 0.05,
      s"tone power $atTone, expected ~${n / 4.0}")
    assert(off < atTone / 100, s"off-tone power $off vs $atTone")
  }

  test("hrvBandPower: judged output is per-user complete with finite ratios") {
    val rows = TrainingData.hrvBandPower(spark, sf()).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0 && r.getDouble(2) >= 0)
      assert(!r.isNullAt(3) && !r.getDouble(3).isNaN)
    }
  }
}
