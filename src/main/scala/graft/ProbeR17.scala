package graft

import org.apache.spark.sql.functions._

/** Scratch sub-stage profiler for round-17 optimization (not part of the
  * driver contract; delete or keep as a measure main). Times the interior
  * stages of the most expensive queries so optimization effort lands where
  * the seconds actually are. Usage: runMain graft.ProbeR17 [sfDir]
  */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- LSH chain breakdown ----
    time("docs read+shingle (noop)") {
      noop(Tables.documents(spark, d).select(col("doc_id"),
        graft.functions.ShingleHash32Expr.shingle_hash32(col("text"), 4).as("hs")))
    }
    val docs = {
      var r: org.apache.spark.sql.DataFrame = null
      time("docs read+shingle (localCheckpoint)") {
        r = Tables.documents(spark, d).select(col("doc_id"),
          graft.functions.ShingleHash32Expr.shingle_hash32(col("text"), 4).as("hs"))
          .localCheckpoint(true)
      }
      r
    }
    time("band signatures (noop)") {
      noop(operators.ScalableDedup.minhashBandSignatures(docs, "doc_id", "hs", 4, 4))
    }
    var cand: org.apache.spark.sql.DataFrame = null
    time("banded candidates count") {
      cand = operators.ScalableDedup.minhashBandedCandidates(docs, "doc_id", "hs", 4, 4)
      println("  n_cand=" + cand.count())
    }
    time("candidates (localCheckpoint)") {
      cand = operators.ScalableDedup.minhashBandedCandidates(docs, "doc_id", "hs", 4, 4)
        .localCheckpoint(true)
    }
    time("rescore on checkpointed cand") {
      val a = cand
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
      noop(a)
    }
    time("full dedup_minhash_lsh (count)") {
      SparkEntry.queries("dedup_minhash_lsh")(spark, d).count()
    }
    time("full llm_dedup_clusters (count)") {
      SparkEntry.queries("llm_dedup_clusters")(spark, d).count()
    }
    time("full llm_lsh_append (count)") {
      SparkEntry.queries("llm_lsh_append")(spark, d).count()
    }

    // ---- triangle count breakdown ----
    time("tri: distinct edges (noop)") {
      noop(Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("cust"), col("l_partkey").as("supp"))
        .distinct())
    }
    time("tri: commonNeighborPairs>=2 count") {
      val e = Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("cust"), col("l_partkey").as("supp"))
        .distinct()
      println("  n_pairs=" + operators.Graph.commonNeighborPairs(e, None)
        .filter(col("common") >= 2).count())
    }
    time("full graph_triangle_count (count)") {
      SparkEntry.queries("graph_triangle_count")(spark, d).count()
    }

    // ---- pagerank breakdown ----
    time("pr: distinct sym edges (noop)") {
      val e0 = Tables.orders(spark, d)
        .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      noop(e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))))
    }
    time("full graph_pagerank (count)") {
      SparkEntry.queries("graph_pagerank")(spark, d).count()
    }

    // ---- hrv_mse / tinn / misc ----
    for (q <- Seq("hrv_mse", "hrv_tinn", "graph_bfs", "graph_kcore",
        "text_gopher_quality", "llm_dsir_weight", "text_langid", "dedup_winnow")) {
      time(s"full $q (count)") { SparkEntry.queries(q)(spark, d).count() }
    }
    spark.stop()
  }
}
