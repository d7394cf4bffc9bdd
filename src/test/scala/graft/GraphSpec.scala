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

  test("pageRank: shuffle-join path (beyond broadcastNodeLimit) matches the broadcast path") {
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 1L))
      .toDF("src", "dst")
    val sym = e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
    def collect(limit: Long): Map[Long, (Long, Double)] =
      Graph.pageRank(sym, 0.85, 5, broadcastNodeLimit = limit)
        .select($"node", $"degree", $"rank").as[(Long, Long, Double)]
        .collect().map { case (n, d, r) => n -> (d, r) }.toMap
    val viaBroadcast = collect(Long.MaxValue)
    val viaShuffle = collect(0L) // forces the co-partitioned shuffle rounds
    assert(viaShuffle.keySet == viaBroadcast.keySet)
    viaBroadcast.foreach { case (n, (d, r)) =>
      val (d2, r2) = viaShuffle(n)
      assert(d2 == d)
      // the two paths run the same arithmetic but the shuffle layout
      // changes the contribution SUMMATION order — agreement is exact
      // up to float addition reassociation (last-ulp), nothing more
      assert(math.abs(r2 - r) <= 4 * Math.ulp(r),
        s"node $n: shuffle rank $r2 != broadcast rank $r")
    }
  }

  test("pageRank: directed input keeps no-in-edge nodes at exact teleport mass") {
    // node 1 has out-edges but NO in-edges; the final left join must
    // surface it with coalesce(rank, teleport), not silently drop it
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(e, 0.85, 3)
      .select($"node", $"rank").as[(Long, Double)].collect().toMap
    // the node set is the SOURCE set {1, 2} (3 is dangling — documented)
    assert(r.keySet == Set(1L, 2L))
    // (1 - 0.85) / 2, in DOUBLE arithmetic exactly as pageRank computes it
    assert(r(1L) == (1 - 0.85) / 2, s"no-in-edge node rank: ${r(1L)}")
    // node 2 receives half of node 1's mass each round — strictly more
    assert(r(2L) > r(1L))
  }

  test("commonNeighborPairs: degree cap drops hub keys, cap-off stays exact") {
    // customer 100 is the hub (5 suppliers → 10 pairs); 1 and 2 are
    // normal (2 suppliers each, both {1,2})
    val e = (Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L), (100L, 5L)) ++
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))).toDF("cust", "supp")
    def pairs(cap: Option[Int]): Map[(Long, Long), Long] =
      Graph.commonNeighborPairs(e, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = pairs(None)
    assert(full.size == 10) // all C(5,2) hub pairs
    assert(full((1L, 2L)) == 3L) // customers 100, 1, 2
    val capped = pairs(Some(4))
    // the hub is dropped whole: only the two normal customers remain
    assert(capped == Map((1L, 2L) -> 2L),
      s"cap must bound fan-out to the non-hub pairs (got $capped)")
  }

  test("orientByDegree: count-identity with id orientation on a hub graph, out-degree capped") {
    // hub 0 touches every leaf 1..8 (degree 8); leaves form a ring
    // (degree 3 each). Triangles are exactly (0, i, i+1) — a triangle
    // per ring edge. Id orientation funnels all 8 hub edges OUT of node
    // 0 (out-degree 8 = the Σdeg² hazard); degree orientation points
    // them INTO the hub, capping every out-degree at ≤ 3.
    val n = 8
    val ring = (1 to n).map(i => (i.toLong, if (i == n) 1L else i + 1L))
    val star = (1 to n).map(i => (0L, i.toLong))
    val pairs = (star ++ ring).map { case (a, b) =>
      (math.min(a, b), math.max(a, b)) }.toDF("s1", "s2")
    def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Graph.triangleCounts(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaId = counts(pairs)
    val viaDeg = counts(Graph.orientByDegree(pairs))
    assert(viaId == viaDeg, s"orientation changed counts: $viaId vs $viaDeg")
    assert(viaId(0L) == n.toLong) // the hub closes every ring triangle
    // the orientation really is degree-ascending: no node keeps more
    // out-edges than the Schank/Wagner cap allows on this fixture
    val outDeg = Graph.orientByDegree(pairs).groupBy($"s1").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!outDeg.contains(0L) || outDeg(0L) == 0L,
      s"hub must have no out-edges under degree orientation: $outDeg")
    assert(outDeg.values.forall(_ <= 3L), s"out-degree cap violated: $outDeg")
  }

  test("bfs: min-hop distances, shortcut wins, unreachable absent, hop bound") {
    // 1→2→3→4→5 path plus the 1→4 shortcut, symmetrized
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("u", "v")
    val sym = e0.union(e0.select($"v".as("u"), $"u".as("v")))
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfs(sym, seeds, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the shortcut makes 4 a 1-hop and 5 a 2-hop node
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
    // hop bound: 1 round from the seed only reaches direct neighbors
    val one = Graph.bfs(sym, seeds, maxHops = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("kCore: pendant peels, cascade stops; k above the core empties") {
    // triangle 1-2-3 plus pendant edge 1-4, symmetrized
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val sym = e0.union(e0.select($"v".as("u"), $"u".as("v")))
    // k=2: node 4 (deg 1) peels in round 1; node 1 drops 3→2 and STAYS
    val core2 = Graph.kCore(sym, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3: the triangle itself is below 3 once the pendant is gone
    assert(Graph.kCore(sym, k = 3, rounds = 4).count() == 0)
  }

  test("kCoreWitness: converged true at the fixpoint, core unchanged") {
    // triangle + pendant: k=2 fixpoint is reached in 1 round
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val sym = e0.union(e0.select($"v".as("u"), $"u".as("v")))
    val r = Graph.kCoreWitness(sym, k = 2, rounds = 4).collect()
    assert(r.map(x => x.getLong(0) -> x.getLong(1)).toMap ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(r.forall(_.getBoolean(2)), "witness must confirm the fixpoint")
  }

  test("kCoreWitness: a graph needing MORE rounds trips the witness") {
    // 12-node path at k=2: each peel round removes the two current
    // endpoints, so emptying takes 6 rounds. After 4 rounds nodes 5..8
    // survive as a 4-node path whose endpoints still have degree 1 —
    // NOT a 2-core — and the witness must say so instead of silently
    // emitting it as one.
    val e0 = (1L to 11L).map(i => (i, i + 1)).toDF("u", "v")
    val sym = e0.union(e0.select($"v".as("u"), $"u".as("v")))
    val r4 = Graph.kCoreWitness(sym, k = 2, rounds = 4).collect()
    assert(r4.map(_.getLong(0)).sorted.toSeq == Seq(5L, 6L, 7L, 8L))
    assert(r4.forall(!_.getBoolean(2)),
      "4 rounds are not the fixpoint here — converged must be false")
    // at the true fixpoint the 2-core of a path is empty
    assert(Graph.kCoreWitness(sym, k = 2, rounds = 6).count() == 0)
  }

  test("graphKcore: judged output carries a constant-true witness") {
    val rows = Graph.graphKcore(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)),
      "judged data must reach its fixpoint within the pinned 4 rounds")
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
