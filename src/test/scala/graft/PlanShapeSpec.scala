package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{FilterExec, InputAdapter, ProjectExec, SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

import graft.operators.{Relational, TimeSeries, TrainingData, Windows}

/** Plan-shape regressions for the audited hot queries: the broadcast /
  * exchange / pushdown facts that make these plans 100 TB-shaped are
  * asserted here so a Spark upgrade or refactor cannot silently revert
  * them to shuffle-heavy or nested-loop forms. String assertions run on
  * the pre-execution physical plan (same technique as HrvSpec).
  */
class PlanShapeSpec extends SparkSpecBase {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    needle.r.findAllIn(hay).size

  test("join_star_5way: all four joins broadcast, fact side streams once") {
    val p = plan(Relational.joinStar5Way(spark, sf()))
    assert(count(p, "BroadcastHashJoin") == 4, s"expected 4 broadcast joins:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), s"a dim fell back to sort-merge:\n$p")
    // one partial+final aggregate pair, i.e. exactly one hash exchange
    assert(count(p, "(?i)exchange hashpartitioning") == 1, p)
  }

  test("join_shuffle: equi-join with partial aggregation, no nested loop") {
    val p = plan(Relational.joinShuffle(spark, sf()))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // partial + final HashAggregate around the group-by
    assert(count(p, "HashAggregate") >= 2, s"expected partial aggregation:\n$p")
  }

  test("scan_range_pruned: the BETWEEN reaches the re-laid scan as a pushed filter") {
    val df = Relational.scanRangePruned(spark, sf())
    df.collect()
    val scans = PlanNodes.all(df.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty, "no file scan in the plan")
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_orderkey,300)")
      && pushed.contains("LessThanOrEqual(l_orderkey,600)"),
      s"BETWEEN not pushed to the range-sorted scan: $pushed")
    // the row-group skip itself (scan emits ≤ one file's rows) is proven
    // in LayoutSpec on a fixture with known per-file ranges
  }

  test("scan_partition_pruned: the date filter prunes directories at planning time") {
    val df = Relational.scanPartitionPruned(spark, sf())
    df.collect()
    val scans = PlanNodes.all(df.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty, "no file scan in the plan")
    val scan = scans.head
    // the BETWEEN must land in PartitionFilters (planner-level directory
    // pruning), not merely PushedFilters (reader-level row-group skipping)
    val pf = scan.partitionFilters.map(_.sql).mkString(";")
    assert(pf.contains("event_date") &&
      (pf.contains(">=") || pf.contains("2024-01-10")),
      s"date predicate not a partition filter: $pf")
    // and it must actually prune: the 6 queried days < the ~30 on disk
    val read = scan.selectedPartitions.partitionCount
    val total = {
      val dirs = new java.io.File(scan.relation.location.rootPaths.head.toUri)
        .listFiles().count(_.getName.startsWith("event_date="))
      dirs
    }
    assert(read < total && read > 0,
      s"expected a pruned read, got $read of $total partitions")
  }

  test("join_bucketed: the join and bucket-key aggregation shuffle NOTHING") {
    val p = plan(Relational.joinBucketed(spark, sf()))
    assert(p.contains("SortMergeJoin"), s"expected the bucketed sort-merge form:\n$p")
    // the entire point of the layout: zero hash exchange for the join AND
    // the group-by (only the final global sort may range-exchange)
    assert(count(p, "(?i)exchange hashpartitioning") == 0,
      s"bucketed join/agg must not shuffle:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"tiny-data broadcast leaked in:\n$p")
    // both scans carry the bucket spec
    assert(count(p, "SelectedBucketsCount") == 2, s"expected 2 bucketed scans:\n$p")
  }

  test("join_asof_native: planned by the custom sorted-merge exec, no row explosion") {
    val p = plan(Relational.joinAsofNative(spark, sf()))
    assert(p.contains("AsofJoin"), s"custom exec missing:\n$p")
    // the whole point vs join+filter+max_by: no pair materialization
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    // ONE exchange per side: the right-hand user_id repartition serves
    // both the dedup aggregate (subset rule) and the exec's clustering
    assert(count(p, "(?i)exchange hashpartitioning") == 2,
      s"expected exactly 2 hash exchanges (one per side):\n$p")
  }

  test("join_range_theta: equi-clause drives a hash join, never a cartesian") {
    val p = plan(Relational.joinRangeTheta(spark, sf()))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range predicate must ride the user_id equi-join as a post-join filter:\n$p")
  }

  test("stream_session: sessionization reuses ONE user_id exchange") {
    val p = plan(TimeSeries.streamSession(spark, sf()))
    val hashEx = count(p, "(?i)exchange hashpartitioning")
    assert(hashEx == 1,
      s"windows + session aggregate must share the user_id partitioning, got $hashEx:\n$p")
  }

  test("stream_session_native: MergingSessions merge on ONE user_id exchange") {
    val p = plan(TimeSeries.streamSessionNative(spark, sf()))
    assert(p.contains("MergingSessions"),
      s"native session-window operator missing from the plan:\n$p")
    // partial agg → one user_id exchange → sort → MergingSessions → final
    // agg → ordinal window, all on the SAME partitioning (only the final
    // presentation orderBy may range-exchange)
    assert(count(p, "(?i)exchange hashpartitioning") == 1,
      s"session merge + ordinal window must share the user_id exchange:\n$p")
  }

  test("text_langid: scan, parallelism widen, one aggregate exchange, no joins") {
    val p = plan(TrainingData.textLangid(spark, sf()))
    // r17: Par.widen adds one repartition exchange on doc_id so the
    // langId heuristic runs off the single-task one-row-group scan; the
    // aggregate exchange is the second (and at production split counts
    // the widen is a no-op and the plan reverts to one)
    assert(count(p, "(?i)exchange hashpartitioning") == 2, p)
    assert(!p.contains("Join"), s"language scoring must be a pure scan+aggregate:\n$p")
  }

  test("subq_not_in: null-aware anti join, not a per-row nested-loop filter") {
    val p = plan(Relational.subqNotIn(spark, sf()))
    // single-column NOT IN takes Spark's optimized NAAJ path: a broadcast
    // left-anti hash join with a one-time null check on the build side —
    // the general fallback is a BroadcastNestedLoopJoin re-testing the
    // (key = x OR key IS NULL) condition per probe row
    assert(p.contains("LeftAnti"), s"expected an anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"NOT IN fell back to the nested-loop form:\n$p")
  }

  test("llm_curate_chain: filters fuse into the scan before the one data shuffle") {
    val p = plan(graft.operators.LlmOps.llmCurateChain(spark, sf()))
    // stats + quality filters must be a map stage (no pre-filter
    // exchange); the only hash exchanges are the dedup window's content-
    // hash partition and nothing else
    assert(count(p, "(?i)exchange hashpartitioning") == 1,
      s"curation must shuffle once (dedup hash), filters fused into the scan:\n$p")
    assert(!p.contains("Join"), s"the chain is shuffle+window, no joins:\n$p")
  }

  test("ts_ohlc_resample: one aggregate exchange, no window, no join") {
    val p = plan(graft.operators.Analytics.tsOhlcResample(spark, sf()))
    assert(count(p, "(?i)exchange hashpartitioning") == 1,
      s"OHLC is one map-side-combinable aggregate:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"), p)
  }

  test("join_right_outer: pre-aggregated fact side, outer join preserved") {
    val p = plan(Relational.joinRightOuter(spark, sf()))
    assert(p.contains("RightOuter") || p.contains("LeftOuter"),
      s"outer semantics must survive planning (Spark may mirror the sides):\n$p")
    assert(count(p, "HashAggregate") >= 2,
      s"fact side must collapse per key BEFORE the join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("fn_string_extras / fn_try_cast: pure map stages, zero exchanges") {
    for (q <- Seq(graft.operators.Scalars.fnStringExtras(spark, sf()),
        graft.operators.Scalars.fnTryCast(spark, sf()))) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("exchange hashpartitioning"),
        s"scalar tiers must fuse into the scan (TakeOrdered handles the sort):\n$p")
      assert(!p.contains("Join") && !p.contains("Window"), p)
    }
  }

  test("join_skew_salted: shuffled hash join, replicated side never broadcast") {
    val p = plan(Relational.joinSkewSalted(spark, sf()))
    assert(p.contains("ShuffledHashJoin"),
      s"salted join must pin the shuffled-hash strategy:\n$p")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
      s"broadcasting the replicated side would serialize the build on the driver:\n$p")
  }

  /** Whether `p` is an aggregate whose output is data-volume independent
    * — empty grouping (1 row) or grouping only on GlobalRank's bucket-id
    * working columns (≤ buckets rows) — reached through pass-through
    * nodes. This is the structural form of the "benign nested loops"
    * claim in Windows.winNtilePctrank's scaladoc. */
  private def boundedAggRoot(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec =>
      // exactly GlobalRank.fresh's bucket-column names ("_b", "_b1", ...):
      // a looser prefix would also accept table-scale columns that merely
      // start with _b and quietly void the audit
      a.groupingExpressions.isEmpty ||
        a.groupingExpressions.forall(_.name.matches("_b\\d*"))
    case r: ReusedExchangeExec => boundedAggRoot(r.child)
    case q: QueryStageExec => boundedAggRoot(q.plan)
    case a: AdaptiveSparkPlanExec => boundedAggRoot(a.executedPlan)
    case u @ (_: ProjectExec | _: FilterExec | _: SortExec |
        _: WholeStageCodegenExec | _: InputAdapter |
        _: BroadcastExchangeExec | _: ShuffleExchangeExec) =>
      boundedAggRoot(u.children.head)
    case _ => false
  }

  test("global-rank queries: every nested-loop build side is a bounded aggregate") {
    // the "benign BNLJ" claim must survive refactors structurally, not by
    // comment: each BroadcastNestedLoopJoin in these plans may only build
    // a 1-row or ≤buckets-row aggregate frame, never table-scale data
    for (q <- Seq(Windows.winNtilePctrank _, Windows.winDenseRankGlobal _,
        Windows.winRankStringGlobal _, Windows.winRankValueGlobal _)) {
      val df = q(spark, sf())
      val bnljs = PlanNodes.all(df.queryExecution.executedPlan)
        .collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(bnljs.nonEmpty, "plan shape changed: no BNLJ left to audit " +
        "(fine if intentional — update this test)")
      bnljs.foreach { j =>
        val build = j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }
        assert(boundedAggRoot(build),
          s"BNLJ build side is not a bounded aggregate:\n$build\n" +
            s"in plan:\n${df.queryExecution.executedPlan}")
      }
    }
  }

  test("filters and projections reach the parquet scan") {
    // PushedFilters must LIST the predicates (the header prints even when
    // the list is empty, so assert content, not presence)
    val pf = plan(Relational.filterPredicates(spark, sf()))
    assert("PushedFilters: \\[[^\\]]*IsNotNull".r.findFirstIn(pf).nonEmpty,
      s"filter not pushed to scan:\n$pf")
    val ps = plan(Relational.scanProject(spark, sf()))
    assert("ReadSchema:[^\\n]*l_orderkey".r.findFirstIn(ps).nonEmpty, ps)
    // projection pruning: the scan must NOT read unprojected wide columns
    assert(!"ReadSchema:[^\\n]*l_comment".r.findFirstIn(ps).nonEmpty,
      s"scan reads columns the query never uses:\n$ps")
  }

  test("join_lateral: decorrelated to a rank-filter join, not a per-row loop") {
    val p = plan(Relational.joinLateral(spark, sf()))
    // the per-order ORDER BY … LIMIT 2 must become a window rank over one
    // equi-join — any nested-loop/cartesian form means decorrelation failed
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"lateral subquery fell back to a nested loop:\n$p")
    assert(p.contains("Window") || p.contains("row_number"),
      s"expected the LIMIT-per-group to plan as a rank window:\n$p")
  }

  test("sample_stratified: both branches aggregate partially, no extra sort") {
    val p = plan(Relational.sampleStratified(spark, sf()))
    // sampled + full sides each get a partial+final HashAggregate pair
    assert(count(p, "HashAggregate") >= 4, s"expected two partial+final pairs:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("text_repetition: a pure map — no exchange before the output sort") {
    val p = plan(TrainingData.textRepetition(spark, sf()))
    // the only exchange allowed is the final ORDER BY's range partitioning
    assert(count(p, "(?i)exchange hashpartitioning") == 0,
      s"per-doc stats must not shuffle:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("ts_multires: GROUPING SETS compiles to ONE Expand over one scan") {
    val p = plan(TimeSeries.tsMultires(spark, sf()))
    assert(count(p, "Expand") == 1, s"expected a single Expand:\n$p")
    assert(count(p, "Scan parquet") == 1,
      s"three grains must ride ONE scan, not three:\n$p")
  }

  test("join_bloom_prefilter: the filter is a literal, not a joined column") {
    val p = plan(Relational.joinBloomPrefilter(spark, sf()))
    // the runtime-filter shape: no cross-join carrying the 128 KB blob
    // into every row (the pre-fix form's BroadcastNestedLoopJoin)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bloom filter must ride as a literal, not a broadcast column:\n$p")
  }

  test("agg_percentile_disc / weighted median: shuffle carries the count table, not rows") {
    for (df <- Seq(Relational.aggPercentileDisc(spark, sf()),
        Relational.aggWeightedMedian(spark, sf()))) {
      val p = plan(df)
      // partial+final aggregate BEFORE the window machinery: the raw
      // scan combines map-side, the windows see only (group, value)
      assert(count(p, "HashAggregate") >= 2, s"count table must pre-aggregate:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("source_scd2_pruned: the as-of disjunct prunes close-version partitions at planning time") {
    val df = Relational.sourceScd2Pruned(spark, sf())
    df.collect()
    val scans = PlanNodes.all(df.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty, "no file scan in the plan")
    val scan = scans.head
    // `effective_to IS NULL OR effective_to > 2` references only the
    // partition column — it must land in PartitionFilters (directory
    // pruning), the read-side scale claim of scd2AsOf's docstring
    val pf = scan.partitionFilters.map(_.sql).mkString(";")
    assert(pf.contains("effective_to"),
      s"as-of predicate not a partition filter: $pf")
    // the dim has close-version partitions {2, 3, null}; as-of v2 must
    // read open + closed-after-v2 and skip the history closed at v2
    val read = scan.selectedPartitions.partitionCount
    assert(read == 2, s"expected 2 of 3 close-version partitions, got $read")
  }

  test("stored plan audit covers every registered query") {
    // round 9's audit silently missed the last-added query — pin the
    // committed metrics file to the live registry so the bookkeeping
    // cannot drift again (regenerate with `runMain graft.Explain`)
    val f = new java.io.File("docs/plans_sf0.01.txt.metrics.jsonl")
    assert(f.exists(), s"${f.getPath} missing — run graft.Explain")
    val audited = scala.io.Source.fromFile(f).getLines()
      .map { l =>
        val m = "\"query\":\"([^\"]+)\"".r.findFirstMatchIn(l)
        m.fold(sys.error(s"bad metrics line: $l"))(_.group(1))
      }.toSet
    assert(audited == SparkEntry.queries.keySet,
      s"missing: ${SparkEntry.queries.keySet -- audited}; " +
        s"stale: ${audited -- SparkEntry.queries.keySet}")
  }
}
