package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** The fused native sq_dist must be bit-identical to the HOF
  * formulation on real embeddings and honor its null contract —
  * VectorFunctions.sqDist silently routes every IVF coarse-assignment
  * and routing distance through it, so any divergence would move
  * judged ANN results. */
class SqDistExprSpec extends SparkSpecBase {
  import spark.implicits._

  test("bit-identical to the higher-order-function form on real embeddings") {
    val emb = Tables.embeddings(spark, sf())
    val a = emb.select($"vec_id".as("a_id"),
      VectorFunctions.toDoubleVec($"embedding").as("ea")).filter($"a_id" < 20)
    val b = emb.select($"vec_id".as("b_id"),
      VectorFunctions.toDoubleVec($"embedding").as("eb")).filter($"b_id".between(20, 60))
    val diff = a.crossJoin(b).select(
      VectorFunctions.sqDist($"ea", $"eb").as("fused"),
      VectorFunctions.sqDistHof($"ea", $"eb").as("hof"))
      .filter($"fused" =!= $"hof") // exact double comparison
    assert(diff.count() == 0)
  }

  test("null contract matches the HOF form: null array, mismatch, null element") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 5.0))),
      (None, Some(Seq(1.0, 2.0))),
      (Some(Seq(1.0)), Some(Seq(1.0, 2.0)))).toDF("a", "b")
    def nulls(c: org.apache.spark.sql.Column) =
      df.select(c).collect().map(_.isNullAt(0)).toSeq
    assert(nulls(VectorFunctions.sqDist($"a", $"b")) == Seq(false, true, true))
    assert(nulls(VectorFunctions.sqDist($"a", $"b")) ==
      nulls(VectorFunctions.sqDistHof($"a", $"b")))
    val withNullElem = spark.sql("SELECT array(1.0d, NULL) a, array(1.0d, 2.0d) b")
    assert(withNullElem.select(VectorFunctions.sqDist($"a", $"b"))
      .collect().head.isNullAt(0))
    // the value itself
    val v = df.select(VectorFunctions.sqDist($"a", $"b")).collect().head.getDouble(0)
    assert(v == 13.0) // (1-3)^2 + (2-5)^2
  }
}
