package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarityExpr.cosine_sim
import graft.functions.VectorFunctions

/** The fused native expression must be bit-identical to the HOF
  * formulation on real embeddings, and honor the null contract. */
class CosineSimilarityExprSpec extends SparkSpecBase {
  import spark.implicits._

  test("bit-identical to the higher-order-function form on real embeddings") {
    val emb = Tables.embeddings(spark, sf())
    val a = emb.select($"vec_id".as("a_id"), $"embedding".as("ea")).filter($"a_id" < 20)
    val b = emb.select($"vec_id".as("b_id"), $"embedding".as("eb")).filter($"b_id".between(20, 60))
    val pairs = a.crossJoin(b)
    val diff = pairs.select(
      cosine_sim($"ea", $"eb").as("fused"),
      (VectorFunctions.dot(VectorFunctions.toDoubleVec($"ea"), VectorFunctions.toDoubleVec($"eb"))
        / (VectorFunctions.norm(VectorFunctions.toDoubleVec($"ea"))
          * VectorFunctions.norm(VectorFunctions.toDoubleVec($"eb")))).as("hof"))
      .filter($"fused" =!= $"hof") // exact double comparison: any bit diff fails
    assert(diff.count() == 0)
  }

  test("null contract: null array, length mismatch, null element → null") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0))),
      (None, Some(Seq(1.0, 2.0))),
      (Some(Seq(1.0)), Some(Seq(1.0, 2.0)))).toDF("a", "b")
    val got = df.select(cosine_sim($"a", $"b")).collect().map(r => r.isNullAt(0))
    assert(got.toSeq == Seq(false, true, true))
    val withNullElem = spark.sql("SELECT array(1.0d, NULL) a, array(1.0d, 2.0d) b")
    assert(withNullElem.select(cosine_sim($"a", $"b")).collect().head.isNullAt(0))
  }

  test("works inside whole-stage codegen and interpreted eval alike") {
    val df = Seq((Seq(3.0, 4.0), Seq(4.0, 3.0))).toDF("a", "b")
    val v = df.select(cosine_sim($"a", $"b")).collect().head.getDouble(0)
    assert(math.abs(v - 24.0 / 25.0) < 1e-15)
    // force interpreted path too
    val codegenOff = df.select(cosine_sim($"a", $"b").as("c"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      assert(codegenOff.collect().head.getDouble(0) == v)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
