package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash join shuffles both sides on the key; one hot key then lands its
  * entire row set on a single task. Salting splits each hot left-side key
  * across `saltBuckets` tasks by appending a random bucket id, and
  * replicates the (small-per-key) right side once per bucket so every
  * salted partition can still find its match. AQE's skew-join splitting
  * handles moderate skew automatically; this is the explicit tool for the
  * pathological case (one key = 10% of 100 TB).
  *
  * The salt on the left is `pmod(hash(tiebreak), n)` — deterministic, no
  * RNG in the task, so retries and speculative tasks produce identical
  * results.
  */
object SkewJoin {

  /** Sketch-driven hot-key detection: probe each candidate key (usually
    * the distinct keys of the SMALL join side) against a Count-Min
    * sketch of the fact side's join key, returning the keys whose
    * estimated fact-row count is ≥ `threshold` — the inputs to route
    * through [[saltedInnerJoin]] while everything else takes the plain
    * join.
    *
    * Why a sketch and not `fact.groupBy(key).count()`: the exact count
    * is itself a full shuffle of the fact table keyed exactly like the
    * join being protected — at 100 TB the diagnosis would cost as much
    * as the disease. The CMS sketch is ONE map-side-combinable
    * aggregate collapsing to 32 KB, broadcast into a codegen'd scalar
    * probe over the candidates — no shuffle touches the fact table.
    * CMS never undercounts, so no hot key is missed; a cold key's
    * worst-case overcount (≤ 2N/w) costs only a needless salting. The
    * sketch can also be yesterday's persisted `graft_cms_sketch` column
    * (functions/CountMin), making detection free at plan time. */
  def hotKeysBySketch(fact: DataFrame, factKey: String, candidates: DataFrame,
      candidateKey: String, threshold: Long): DataFrame = {
    val sk = fact.agg(
      graft.functions.CountMin.cmsSketch(col(factKey)).as("_sk"))
    candidates.select(col(candidateKey)).distinct()
      .crossJoin(broadcast(sk))
      .filter(graft.functions.CountMin.cmsEstimate(col("_sk"),
        col(candidateKey)) >= threshold)
      .select(col(candidateKey))
  }

  def saltedInnerJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, tiebreak: String, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val salted = left.withColumn("_salt",
      pmod(hash(col(tiebreak)), lit(saltBuckets)))
    // pin the shuffled-hash strategy: salting only exists for joins whose
    // right side CANNOT broadcast (a broadcast join has no per-key task
    // skew to fix, and auto-broadcasting the ×saltBuckets replicated side
    // would serialize the build on the driver)
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
      .hint("shuffle_hash")
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
