package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{IntervalJoin, TrainingData}

/** Semantics of the bucketed interval-overlap join and the winnowing
  * fingerprint (SURVEY.md §2.3 #10b, §2.13 #61b). */
class IntervalJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  private def intervals(rows: (Long, Long, Long)*) =
    rows.toSeq.map { case (id, a, b) => (id, ts(a), ts(b)) }
      .toDF("id", "st", "en")

  /** Oracle-in-miniature: the naive theta join the bucketing must match. */
  private def naivePairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val a = df.select($"id".as("a_id"), $"st".as("a_st"), $"en".as("a_en"))
    val b = df.select($"id".as("b_id"), $"st".as("b_st"), $"en".as("b_en"))
    a.join(b, $"a_id" < $"b_id" && $"a_st" <= $"b_en" && $"b_st" <= $"a_en")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
  }

  private def bucketedPairs(df: org.apache.spark.sql.DataFrame,
      bucketSeconds: Long): Seq[(Long, Long)] =
    IntervalJoin.overlapSelfJoin(df, "id", "st", "en", bucketSeconds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("bucketed overlap join matches the naive theta join, exactly once per pair") {
    // intervals deliberately spanning bucket boundaries (bucket = 10 min):
    // (1,2) share two buckets — must still be emitted once
    val df = intervals((1L, 5, 15), (2L, 9, 25), (3L, 30, 40), (4L, 41, 50), (5L, 14, 31))
    val got = bucketedPairs(df, 600)
    assert(got.size == got.toSet.size, s"duplicate pairs emitted: $got")
    assert(got.toSet == naivePairs(df))
  }

  test("closed-interval semantics: touching endpoints overlap, one-minute gap does not") {
    val df = intervals((1L, 0, 10), (2L, 10, 20), (3L, 21, 30))
    assert(bucketedPairs(df, 600).toSet == Set((1L, 2L)))
  }

  test("bucket size does not change the answer") {
    val df = intervals((1L, 5, 65), (2L, 50, 70), (3L, 100, 160), (4L, 0, 200))
    val expected = naivePairs(df)
    for (b <- Seq(60L, 600L, 3600L, 7200L))
      assert(bucketedPairs(df, b).toSet == expected, s"bucketSeconds=$b")
  }

  test("judged interval query plans an equi-join, never a nested loop") {
    val p = IntervalJoin.joinIntervalBucketed(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"non-equi fallback leaked into the interval join:\n$p")
  }

  test("winnowing: shared substrings of length >= w+k-1 share a fingerprint") {
    val shared = "the quick brown fox jumps"
    val docs = Seq(
      (1L, s"AAAA $shared BBBB"),
      (2L, s"zzz $shared qqqq"),
      // disjoint alphabet (and single spaces), so no 4-gram can collide
      (3L, "XQXQ ZVZV XQZV ZVXQ XQXQ ZVZV")).toDF("id", "text")
    val fp = TrainingData.winnowFingerprints(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val bySet = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((bySet(1L) & bySet(2L)).nonEmpty, "shared run produced no shared fingerprint")
    assert((bySet(1L) & bySet(3L)).isEmpty, "unrelated docs collided")
  }

  test("winnowing: texts shorter than w+k-1 chars produce no fingerprints") {
    val docs = Seq((1L, "1234567"), (2L, "12345678")).toDF("id", "text")
    val ids = TrainingData.winnowFingerprints(docs, "id", "text")
      .select("id").distinct().as[Long].collect().toSet
    assert(ids == Set(2L))
  }
}
