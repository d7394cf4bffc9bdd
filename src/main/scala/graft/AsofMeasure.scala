package graft

import org.apache.spark.sql.functions._

/** Throwaway measurement: native sorted-merge as-of vs the composed
  * join+max formulation, self as-of over events (each event finds its
  * user's latest strictly earlier event). */
object AsofMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    import spark.implicits._
    val e = Tables.events(spark, sfDir).select($"user_id", $"ts", $"event_id")
    val probe = e.select($"user_id", ($"ts" - expr("interval 1 microsecond")).as("pt"),
      $"event_id".as("lid"))
    val hist = e.select($"user_id", $"ts".as("rt"), $"event_id".as("rid"))

    // consume every output column through a hash-sum so Catalyst cannot
    // prune the aggregates or eliminate the join under a bare count()
    def sink(df: org.apache.spark.sql.DataFrame): Long = {
      val d = df.toDF(df.columns.indices.map("c" + _).toIndexedSeq: _*)
      d.select(avg(xxhash64(d.columns.map(col).toIndexedSeq: _*)).as("h"),
        count(lit(1)).as("n")).first().getLong(1)
    }
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"[asof-measure] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    time("native-merge") {
      sink(graft.plans.AsofJoin(probe, hist, Seq("user_id"), "pt", "rt"))
    }
    time("join+max_by") {
      sink(probe.join(hist, probe("user_id") === hist("user_id") && $"rt" <= $"pt", "left_outer")
        .groupBy($"lid").agg(max_by($"rid", $"rt").as("rid"), max($"rt").as("rt")))
    }

    // Dense regime: 32 keys x 20000 events each -> 12.8B candidate pairs
    // for the composed form, still 640k rows for the merge.
    val dense = spark.range(32).select($"id".as("k"))
      .select($"k", explode(sequence(lit(1), lit(20000))).as("i"))
      .select($"k", timestamp_seconds($"i" * 7).as("ts"),
        ($"k" * 100000 + $"i").as("eid"))
    val dp = dense.select($"k", ($"ts" - expr("interval 1 microsecond")).as("pt"),
      $"eid".as("lid"))
    val dh = dense.select($"k", $"ts".as("rt"), $"eid".as("rid"))
    time("dense native-merge") {
      sink(graft.plans.AsofJoin(dp, dh, Seq("k"), "pt", "rt"))
    }
    time("dense join+max_by") {
      sink(dp.join(dh, dp("k") === dh("k") && $"rt" <= $"pt", "left_outer")
        .groupBy($"lid").agg(max_by($"rid", $"rt").as("rid"), max($"rt").as("rt")))
    }
    spark.stop()
  }
}
