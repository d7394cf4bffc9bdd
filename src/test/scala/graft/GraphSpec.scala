package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** PageRank invariants and a hand-checkable fixture (the judged query's
  * correctness is the DuckDB 5-CTE oracle; this pins the API pieces —
  * degree handling, teleport, damping — on graphs small enough to reason
  * about by hand). */
class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  test("pageRank: rank mass is conserved (symmetric graph, no dangling)") {
    // symmetric ⇒ no dangling nodes ⇒ total rank stays exactly 1 in
    // exact arithmetic; float gives ~1e-12
    val e0 = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")).toDF("src", "dst")
    val sym = e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
    val total = Graph.pageRank(sym, 0.85, 5).agg(sum($"rank")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-9, s"rank mass drifted: $total")
  }

  test("pageRank: symmetric star — center rank exceeds leaves, leaves equal") {
    val e0 = Seq(("hub", "l1"), ("hub", "l2"), ("hub", "l3")).toDF("src", "dst")
    val sym = e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
    val r = Graph.pageRank(sym, 0.85, 5)
      .select($"node", $"rank").as[(String, Double)].collect().toMap
    assert(r("hub") > r("l1"))
    assert(math.abs(r("l1") - r("l2")) < 1e-12 && math.abs(r("l2") - r("l3")) < 1e-12)
    // closed-form check for the 1-step star: leaves alternate between
    // two values; after an odd number of rounds from uniform init the
    // exact recurrence is easy to unroll by hand — do 1 iteration
    val one = Graph.pageRank(sym, 0.85, 1)
      .select($"node", $"rank").as[(String, Double)].collect().toMap
    // n=4, init 1/4; hub gets 0.15/4 + 0.85*(3 leaves * (1/4)/1)
    assert(math.abs(one("hub") - (0.15 / 4 + 0.85 * 3 * 0.25)) < 1e-12)
    // each leaf gets 0.15/4 + 0.85*((1/4)/3) from the hub
    assert(math.abs(one("l1") - (0.15 / 4 + 0.85 * 0.25 / 3)) < 1e-12)
  }

  test("pageRank: two disconnected pairs — all ranks equal by symmetry") {
    val e0 = Seq(("a", "b"), ("c", "d")).toDF("src", "dst")
    val sym = e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
    val ranks = Graph.pageRank(sym, 0.85, 3).select($"rank").as[Double].collect()
    assert(ranks.length == 4)
    assert(ranks.forall(r => math.abs(r - 0.25) < 1e-12))
  }

  test("graphPagerank: judged output is ordered, complete, and mass-conserving") {
    val df = Graph.graphPagerank(spark, sf())
    val rows = df.collect()
    assert(rows.length == 160) // 150 customers + 10 suppliers at sf0.001
    val nodes = rows.map(_.getString(0))
    assert(nodes.sameElements(nodes.sorted))
    val total = rows.map(_.getDouble(2)).sum
    assert(math.abs(total - 1.0) < 1e-6, s"judged rank mass: $total")
  }
}
