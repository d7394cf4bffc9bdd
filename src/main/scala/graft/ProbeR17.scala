package graft

import org.apache.spark.sql.functions._

/** Scratch sub-stage profiler for round-17 optimization (not part of the
  * driver contract). Times the interior stages of the most expensive
  * queries so optimization effort lands where the seconds actually are.
  * Usage: runMain graft.ProbeR17 [sfDir]
  */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[probe] $label%-44s $best%.3f s (best of 3)")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- graph_triangle_count interior ----
    def triEdges = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("cust"), col("l_partkey").as("supp"))
      .distinct()
    time("tri: scan lineitem 2 cols (noop)") {
      noop(Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey")))
    }
    time("tri: distinct edges (noop)") { noop(triEdges) }
    time("tri: basket self-join pairs>=2 (noop)") {
      noop(operators.Graph.commonNeighborPairs(triEdges, None)
        .filter(col("common") >= 2).select(col("s1"), col("s2")))
    }
    time("tri: + checkpoint raw") {
      operators.Graph.commonNeighborPairs(triEdges, None)
        .filter(col("common") >= 2).select(col("s1"), col("s2"))
        .localCheckpoint(true)
    }
    time("full graph_triangle_count") {
      SparkEntry.queries("graph_triangle_count")(spark, d).count()
    }

    // ---- graph_pagerank interior ----
    def prEdges = {
      val e0 = Tables.orders(spark, d)
        .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    }
    time("pr: sym edges (noop)") { noop(prEdges) }
    time("pr: sym edges checkpoint") { prEdges.localCheckpoint(true) }
    time("full graph_pagerank") {
      SparkEntry.queries("graph_pagerank")(spark, d).count()
    }
    time("full graph_bfs") { SparkEntry.queries("graph_bfs")(spark, d).count() }
    time("full graph_kcore") { SparkEntry.queries("graph_kcore")(spark, d).count() }
    time("full graph_common_neighbors") {
      SparkEntry.queries("graph_common_neighbors")(spark, d).count()
    }

    // ---- bfs/kcore shared front half ----
    time("bfs/kcore: co-trade sym edges (noop)") {
      val e = Tables.orders(spark, d)
        .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_custkey") < 300)
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .distinct()
      val p = operators.Graph.commonNeighborPairs(e, None)
        .filter(col("common") >= 3).select(col("s1"), col("s2"))
      noop(p.select(col("s1").as("u"), col("s2").as("v"))
        .union(p.select(col("s2").as("u"), col("s1").as("v"))))
    }

    // ---- ann / events heavies ----
    for (q <- Seq("ann_ivf_exact", "ann_ivfpq_exact", "hrv_mse", "hrv_tinn",
        "hrv_rolling_sampen", "ts_changepoint", "ts_anomaly_zscore",
        "stream_session", "stream_session_native", "source_scd2_asof",
        "join_asof_nearest", "sample_stratified", "llm_cosine_topk",
        "dedup_cc_clusters", "llm_dedup_append")) {
      time(s"full $q") { SparkEntry.queries(q)(spark, d).count() }
    }
    spark.stop()
  }
}
