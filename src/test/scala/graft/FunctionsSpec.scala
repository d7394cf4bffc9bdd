package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Unit tests for the engine's Column-expression helper libraries. */
class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("cosine(v, v) is 1; orthogonal vectors give 0") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
      (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f))
    ).toDF("a", "b")
    val r = df.select(VectorFunctions.cosine(
      VectorFunctions.toDoubleVec($"a"), VectorFunctions.toDoubleVec($"b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(r(0) - 1.0) < 1e-12)
    assert(math.abs(r(1)) < 1e-12)
  }

  test("dot product matches a hand computation") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val r = df.select(VectorFunctions.dot($"a", $"b")).collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("bigrams: n tokens give n-1 bigrams in order; cap truncates") {
    val df = Seq("a b c d").toDF("text")
      .select(TextFunctions.tokens($"text").as("ws"))
    val bg = df.select(TextFunctions.bigrams($"ws").as("bg")).collect().head.getSeq[String](0)
    assert(bg == Seq("a b", "b c", "c d"))
    val capped = df.select(TextFunctions.bigrams($"ws", cap = 2).as("bg"))
      .collect().head.getSeq[String](0)
    assert(capped == Seq("a b", "b c"))
  }

  test("jaccard of identical sets is 1, disjoint sets 0") {
    val df = Seq(("a b c", "a b c"), ("a b", "c d")).toDF("x", "y")
    val r = df.select(TextFunctions.jaccard(
      TextFunctions.tokenSet($"x"), TextFunctions.tokenSet($"y")).as("j"))
      .collect().map(_.getDouble(0))
    assert(r(0) == 1.0 && r(1) == 0.0)
  }

  test("fn_map: map build/probe/fold/filter agrees with the relational restatement") {
    val out = graft.operators.Scalars.fnMap(spark, sf()).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val e = Tables.events(spark, sf())
    val t = e.groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
    val exact = t.groupBy($"user_id").agg(
        max(when($"event_type" === "purchase", $"n")).as("purchases"),
        max(when($"event_type" === "click", $"n")).as("clicks"),
        count(lit(1)).as("n_types"), sum($"n").as("total"),
        count(when($"n" > 5, lit(1))).as("n_hot"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out == exact)
    assert(out.nonEmpty)
    // the probe contract (element_at of an absent key is null, not 0)
    // on a fixture where absence is guaranteed
    val probe = Seq((1L, "click", 3L)).toDF("user_id", "event_type", "n")
      .groupBy($"user_id")
      .agg(map_from_entries(collect_list(struct($"event_type", $"n"))).as("m"))
      .select(element_at($"m", "purchase").as("p"), element_at($"m", "click").as("c"))
      .collect().head
    assert(probe.isNullAt(0) && probe.getLong(1) == 3L)
  }
}
