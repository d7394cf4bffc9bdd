package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{DedupClusters, ScalableDedup}

class DedupClustersSpec extends SparkSpecBase {
  import spark.implicits._

  test("components: chain and island resolve to min-id labels") {
    // 1-2, 2-3 form one component; 5-6 another; 9 appears only via 9-9? no — absent
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val comps = DedupClusters.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("components converge on a long chain (diameter > 1)") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val comps = DedupClusters.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(1)).distinct
    assert(comps.toSeq == Seq(1L))
  }

  test("non-convergence within maxIter throws instead of returning wrong labels") {
    // chain of diameter 6 with maxIter=2 cannot converge
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      DedupClusters.connectedComponents(pairs, "a", "b", maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("diameter == maxIter converges (labels final on the last allowed pass)") {
    // chain 1-2-3-4: diameter 3; labels final after pass 3, observed on pass 4
    val pairs = (1L until 4L).map(i => (i, i + 1)).toDF("a", "b")
    val comps = DedupClusters.connectedComponents(pairs, "a", "b", maxIter = 3)
      .collect().map(r => r.getLong(1)).distinct
    assert(comps.toSeq == Seq(1L))
  }

  test("keepers and replacement map") {
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("a", "b")
    val k = DedupClusters.keepers(DedupClusters.connectedComponents(pairs, "a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(k == Set((10L, 10L, 3L), (40L, 40L, 2L)))
    val repl = DedupClusters.replacementMap(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repl == Map(20L -> 10L, 30L -> 10L, 50L -> 40L))
  }

  test("end-to-end: simhash candidates cluster the exact duplicates") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "totally unrelated content concerning query engines and big shuffles"),
      (4L, "the quick brown fox jumps over the lazy dog again and again today"),
      (7L, "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text")
      .withColumn("toks", TextFunctions.tokens($"text"))
    val pairs = ScalableDedup.simhashCandidates(docs, "doc_id", "toks", maxHamming = 3)
    val repl = DedupClusters.replacementMap(pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repl == Map(4L -> 1L, 7L -> 1L)) // 2 survives untouched
  }
}
