package graft

import org.apache.spark.sql.functions._

import graft.plans.AsofJoin

class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: Long) = timestamp_seconds(lit(s))

  test("backward inclusive match, left outer, null-key/null-time semantics") {
    val left = Seq(
      (Some("a"), Some(10L), 1),
      (Some("a"), Some(20L), 2),
      (Some("b"), Some(5L), 3),
      (Some("c"), Some(7L), 4),
      (None: Option[String], Some(9L), 5),
      (Some("a"), None: Option[Long], 6))
      .toDF("k", "t", "lid")
      .select($"k", timestamp_seconds($"t").as("t"), $"lid")
    val right = Seq(
      (Some("a"), Some(10L), "r1"),
      (Some("a"), Some(15L), "r2"),
      (Some("b"), Some(6L), "r3"),
      (Some("a"), None: Option[Long], "rX"),
      (None: Option[String], Some(1L), "rN"))
      .toDF("k", "rt", "v")
      .select($"k", timestamp_seconds($"rt").as("rt"), $"v")

    val out = AsofJoin(left, right, Seq("k"), "t", "rt")
      .select($"lid", $"v")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)))).toMap

    assert(out(1) == Some("r1")) // tie rt == t is inclusive
    assert(out(2) == Some("r2")) // latest of r1/r2
    assert(out(3) == None)       // only right row for b is later (6 > 5)
    assert(out(4) == None)       // no right rows for key c
    assert(out(5) == None)       // null left key never matches
    assert(out(6) == None)       // null left time matches nothing
  }

  test("matches the brute-force join+max formulation on events (self as-of)") {
    val e = Tables.events(spark, sf())
      .select($"user_id", $"ts", $"event_id", $"value")
    // each event looks up the latest STRICTLY EARLIER event of the same
    // user by shifting the probe time back one microsecond
    val probe = e.select($"user_id", ($"ts" - expr("interval 1 microsecond")).as("pt"),
      $"event_id".as("lid"))
    val hist = e.select($"user_id", $"ts".as("rt"), $"event_id".as("rid"))

    val native = AsofJoin(probe, hist, Seq("user_id"), "pt", "rt")
      .select($"lid", $"rt")
    val brute = probe.join(hist,
        probe("user_id") === hist("user_id") && $"rt" <= $"pt", "left_outer")
      .groupBy($"lid").agg(max($"rt").as("rt"))

    val n = native.orderBy($"lid").collect().map(r => (r.get(0), r.get(1)))
    val b = brute.orderBy($"lid").collect().map(r => (r.get(0), r.get(1)))
    assert(n.length == b.length && n.length > 0)
    assert(n.sameElements(b))
    // sanity: some rows matched, and the earliest event per user did not
    assert(n.count(_._2 != null) > 0 && n.count(_._2 == null) > 0)
  }

  test("plan: native exec, one exchange per side, no nested-loop fallback") {
    val left = Seq(("a", 10L, 1)).toDF("k", "t", "lid")
    val right = Seq(("a", 5L, "r")).toDF("k", "rt", "v")
    val plan = AsofJoin(left, right, Seq("k"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    val exchanges = "(?i)exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("empty right side leaves every left row unmatched") {
    val left = Seq(("a", 10L, 1), ("b", 20L, 2)).toDF("k", "t", "lid")
    val right = Seq.empty[(String, Long, String)].toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt").collect()
    assert(out.length == 2 && out.forall(_.isNullAt(4)))
  }

  test("mismatched key types widen to the common type at construction") {
    val left = Seq((1, 10L, 1)).toDF("k", "t", "lid") // int key
    val right = Seq((1L, 5L, "r")).toDF("k", "rt", "v") // long key
    val out = AsofJoin(left, right, Seq("k"), "t", "rt")
      .select($"lid", $"v").as[(Int, String)].collect()
    assert(out.sameElements(Array((1, "r"))))
    // incompatible pair fails fast with a clear message, not mid-job
    val bad = Seq(("x", 10L, 1)).toDF("k", "t", "lid")
    val ex = intercept[IllegalArgumentException] {
      AsofJoin(bad, right, Seq("k"), "t", "rt")
    }
    assert(ex.getMessage.contains("no common type"))
  }

  test("forward direction takes the earliest successor, tie inclusive") {
    val left = Seq(("a", 10L, 1), ("a", 20L, 2), ("b", 5L, 3)).toDF("k", "t", "lid")
    val right = Seq(("a", 10L, "eq"), ("a", 15L, "mid"), ("b", 4L, "old"))
      .toDF("k", "rt", "v")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", direction = "forward")
      .select($"lid", $"v").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)))).toMap
    assert(out(1) == Some("eq"))  // rt == t is inclusive
    assert(out(2) == None)        // nothing at/after 20 for key a
    assert(out(3) == None)        // only right row for b is earlier
  }

  test("forward matches the brute-force min formulation on events") {
    val e = Tables.events(spark, sf()).select($"user_id", $"ts", $"event_id")
    val probe = e.select($"user_id", ($"ts" + expr("interval 1 microsecond")).as("pt"),
      $"event_id".as("lid"))
    val hist = e.select($"user_id", $"ts".as("rt"), $"event_id".as("rid"))
    val native = AsofJoin(probe, hist, Seq("user_id"), "pt", "rt",
      direction = "forward").select($"lid", $"rt")
    val brute = probe.join(hist,
        probe("user_id") === hist("user_id") && $"rt" >= $"pt", "left_outer")
      .groupBy($"lid").agg(min($"rt").as("rt"))
    val n = native.orderBy($"lid").collect().map(r => (r.get(0), r.get(1)))
    val b = brute.orderBy($"lid").collect().map(r => (r.get(0), r.get(1)))
    assert(n.length == b.length && n.sameElements(b))
  }

  test("tolerance bounds the lookback/lookahead in native time units") {
    val left = Seq(("a", 100L, 1), ("a", 200L, 2)).toDF("k", "t", "lid")
      .select($"k", timestamp_seconds($"t").as("t"), $"lid")
    val right = Seq(("a", 95L, "near"), ("a", 120L, "far")).toDF("k", "rt", "v")
      .select($"k", timestamp_seconds($"rt").as("rt"), $"v")
    // backward, 10s tolerance (micros): t=100 matches rt=95 (5s back);
    // t=200's latest predecessor rt=120 is 80s back -> dropped
    val back = AsofJoin(left, right, Seq("k"), "t", "rt",
        tolerance = Some(10L * 1000000))
      .select($"lid", $"v").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)))).toMap
    assert(back == Map(1 -> Some("near"), 2 -> None))
    // forward, 10s tolerance: t=100's earliest successor rt=120 is 20s
    // ahead -> dropped; t=200 has no successor at all
    val fwd = AsofJoin(left, right, Seq("k"), "t", "rt",
        direction = "forward", tolerance = Some(10L * 1000000))
      .select($"lid", $"v").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)))).toMap
    assert(fwd == Map(1 -> None, 2 -> None))
    // non-integral time type fails fast at construction
    val strT = Seq(("a", "x", 1)).toDF("k", "t", "lid")
    val strR = Seq(("a", "y", "v")).toDF("k", "rt", "v")
    val ex = intercept[IllegalArgumentException] {
      AsofJoin(strT, strR, Seq("k"), "t", "rt", tolerance = Some(1L))
    }
    assert(ex.getMessage.contains("tolerance requires"))
  }

  test("multi-column keys cluster and match independently") {
    val left = Seq(("a", 1, 10L, 1), ("a", 2, 10L, 2)).toDF("k1", "k2", "t", "lid")
    val right = Seq(("a", 1, 5L, "m1"), ("a", 2, 6L, "m2"), ("a", 2, 11L, "late"))
      .toDF("k1", "k2", "rt", "v")
    val out = AsofJoin(left, right, Seq("k1", "k2"), "t", "rt")
      .select($"lid", $"v").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "m1", 2 -> "m2"))
  }

  test("join_asof_nearest equals brute-force nearest with backward ties") {
    import org.apache.spark.sql.expressions.Window
    val out = graft.operators.Relational.joinAsofNearest(spark, sf())
      .collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    val e = Tables.events(spark, sf())
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        unix_micros($"ts").as("p_um"))
    val c = e.filter($"event_type" === "click")
      .groupBy($"user_id", unix_micros($"ts").as("c_um"))
      .agg(max($"event_id").as("click_id"))
    // rank every click of the user by (|gap|, prefer-backward): the
    // engine's two-pass compose must agree with this direct statement
    val w = Window.partitionBy($"purchase_id")
      .orderBy(abs($"c_um" - $"p_um"),
        when($"c_um" <= $"p_um", lit(0)).otherwise(lit(1)))
    val brute = p.join(c, Seq("user_id"), "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"purchase_id",
        when($"c_um".isNotNull, $"click_id").as("click_id"),
        when($"c_um".isNotNull, abs($"c_um" - $"p_um")).as("gap_us"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(out == brute)
    assert(out.nonEmpty)
  }
}
