package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the PQ encode hot path: the native fused expression
  * (graft.functions.PqEncodeExpr) against the interpreted
  * higher-order-function formulation (Pq.encodeHof) on identical rows —
  * the round-14 regression's reproducible record, in the SkewMeasure
  * tradition of measuring the claim rather than arguing it.
  *
  * Usage: runMain graft.PqMeasure [exprRows] [hofRows]
  * (hofRows defaults low — the HOF form measured ~86 ms/row.)
  * Prints one JSON line {"metric":"pq_encode",...} with rows/s both ways.
  */
object PqMeasure {
  def main(args: Array[String]): Unit = {
    val nExpr = if (args.length > 0) args(0).toInt else 200000
    val nHof = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic 64-dim vectors: v(id)[t] = sin(id·64 + t), any seedless
    // per-row lattice works — the codebook only needs plausible geometry
    val dim = 64
    def vecs(n: Int) = spark.range(n).select($"id",
      transform(sequence(lit(0), lit(dim - 1)),
        t => sin(($"id" * dim + t).cast("double"))).as("embedding"))
    val trainDf = vecs(2000).withColumn("embedding",
      transform($"embedding", x => x.cast("float")))
    val cb = graft.operators.Pq.train(spark, trainDf, "embedding", m = 8, k = 16)

    def best3(f: => Unit): Double = {
      f // warmup (codegen + JIT)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }.min
    }
    // the consuming aggregate forces every row's codes to materialize
    // while shipping only one number back to the driver
    val exprDf = vecs(nExpr)
    val tExpr = best3 {
      graft.operators.Pq.encode(exprDf, "embedding", cb)
        .agg(sum(element_at(col("codes"), 1))).head
      ()
    }
    val hofDf = vecs(nHof)
    val tHof = best3 {
      graft.operators.Pq.encodeHof(hofDf, "embedding", cb)
        .agg(sum(element_at(col("codes"), 1))).head
      ()
    }
    println(s"""{"metric":"pq_encode","dim":$dim,"m":8,"k":16,""" +
      s""""expr_rows":$nExpr,"expr_s":${f"$tExpr%.3f"},""" +
      s""""expr_rows_per_s":${(nExpr / tExpr).toLong},""" +
      s""""hof_rows":$nHof,"hof_s":${f"$tHof%.3f"},""" +
      s""""hof_rows_per_s":${(nHof / tHof).toLong},""" +
      s""""speedup":${f"${(nExpr / tExpr) / (nHof / tHof)}%.0f"}}""")
    spark.stop()
  }
}
