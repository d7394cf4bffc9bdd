package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Sketch accuracy cross-checked against the exact judged twins. */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val ev = Tables.events(spark, sf())

  test("HLL distinct count within 5% of the exact judged count") {
    val both = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"),
        Sketches.approxDistinct($"user_id").as("approx"))
      .collect()
    both.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }

  test("approximate quantiles bracket the exact percentile") {
    val r = ev.agg(
      expr("percentile(value, 0.5)").as("exact_med"),
      Sketches.approxQuantiles($"value", Seq(0.5)).as("approx"))
      .collect().head
    val exact = r.getDouble(0)
    val approx = r.getSeq[Double](1).head
    assert(math.abs(approx - exact) / math.max(exact, 1e-9) < 0.05)
  }

  test("heavy hitters finds the planted hot value") {
    val df = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"cold$i")).toDF("v")
    val hh = Sketches.heavyHitters(df, "v", support = 0.5)
      .collect().head.getSeq[String](0)
    assert(hh.contains("hot"))
  }

  test("profile emits one row per group with sane bounds") {
    val p = Sketches.profile(ev, "event_type", "value").collect()
    assert(p.length == 5)
    p.foreach { r =>
      val qs = r.getSeq[Double](3)
      assert(qs.length == 3 && qs(0) <= qs(1) && qs(1) <= qs(2))
      assert(r.getDouble(4) <= qs(0) && qs(2) <= r.getDouble(5))
    }
  }
}
