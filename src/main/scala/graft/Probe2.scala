package graft
import org.apache.spark.sql.functions._
object Probe2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[p2] $label%-46s $best%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def docsW = operators.Par.widen(Tables.documents(spark, d)
        .select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        graft.functions.ShingleHash32Expr.shingle_hash32(col("text"), 4).as("hs"))
    time("lsh: docs shingle widened (noop)") { noop(docsW) }
    time("lsh: docs shingle widened (ckpt)") { docsW.localCheckpoint(true) }
    val docs = docsW.localCheckpoint(true)
    time("lsh: band sigs (noop)") {
      noop(operators.ScalableDedup.minhashBandSignatures(docs, "doc_id", "hs", 4, 4))
    }
    time("lsh: candidates distinct (noop)") {
      noop(operators.ScalableDedup.minhashBandedCandidates(docs, "doc_id", "hs", 4, 4))
    }
    time("lsh: full rescore (noop)") {
      val cand = operators.ScalableDedup.minhashBandedCandidates(docs, "doc_id", "hs", 4, 4)
      val r = cand
        .join(docs.select(col("doc_id").as("a_id"), col("hs").as("ha"),
          size(col("hs")).as("na")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("hs").as("hb"),
          size(col("hs")).as("nb")), "b_id")
        .filter(least(col("na"), col("nb")) * 5 >= greatest(col("na"), col("nb")) * 4)
        .withColumn("inter",
          graft.functions.SortedIntersectCountExpr.sorted_intersect_count(
            col("ha"), col("hb")).cast("int"))
        .select(col("a_id"), col("b_id"),
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")), 6).as("jac"))
        .filter(col("jac") >= 0.8)
      noop(r)
    }
    time("full dedup_minhash_lsh") { SparkEntry.queries("dedup_minhash_lsh")(spark, d).count() }
    time("full llm_dedup_clusters") { SparkEntry.queries("llm_dedup_clusters")(spark, d).count() }
    time("full llm_lsh_append") { SparkEntry.queries("llm_lsh_append")(spark, d).count() }
    time("full hrv_tinn") { SparkEntry.queries("hrv_tinn")(spark, d).count() }
    time("full graph_pagerank") { SparkEntry.queries("graph_pagerank")(spark, d).count() }
    spark.stop()
  }
}
