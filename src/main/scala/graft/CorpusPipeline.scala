package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis, TextFunctions}
import graft.operators.{DedupClusters, ScalableDedup}

/** The training-data curation shape end to end, composed from the library
  * operators: annotate → quality-gate → exact dedup → near-dup cluster
  * removal → curated corpus + per-language stats.
  *
  * Stage scale behavior (each documented at its operator):
  *  1. annotation is ONE map pass (quality score, language id, rolling
  *     fingerprint, token array — all codegen'd Column expressions);
  *  2. the quality gate is a filter on that pass (no shuffle);
  *  3. exact dedup is the aggregate form (map-side-combinable group-by on
  *     md5(text) → min doc_id keeper — no full-row shuffle, no per-key
  *     sort) followed by a semi-join on the slim keeper-id column;
  *  4. near-dup removal shuffles on 16-bit SimHash bands
  *     (ScalableDedup.simhashCandidates — candidate pairs from bucket
  *     equi-joins, never all-pairs) and resolves duplicate CLUSTERS with
  *     min-label propagation (DedupClusters), dropping every non-keeper;
  *  5. outputs are the curated corpus and a per-language stats rollup.
  *
  * Intermediate stages that feed multiple actions (two writes + the
  * summary counts) are persisted once and unpersisted on exit, so the
  * regex-heavy annotation pass runs once, not once per action.
  */
object CorpusPipeline {

  case class CurationSummary(input: Long, afterQuality: Long,
      afterExactDedup: Long, curated: Long, nearDupMembersRemoved: Long)

  /** The shared annotation stage (quality score, language id, rolling
    * fingerprint) — stateless Column maps. Used by both curate() and the
    * streaming twin (StreamingOps.annotateDocuments) so batch and stream
    * cannot drift. */
  def annotate(docs: DataFrame): DataFrame =
    docs.withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .withColumn("fp", TextAnalysis.rollingFingerprint(col("text")))

  /** Curate a document table (must have `doc_id` long and `text` string).
    *
    * @param minQuality  quality-score gate in [0,1]
    * @param maxHamming  SimHash hamming radius treated as near-duplicate;
    *                    must be ≤ 3 (the 4-band pigeonhole guarantee in
    *                    ScalableDedup.simhashCandidates only holds there)
    */
  def curate(spark: SparkSession, docs: DataFrame, outDir: String,
      minQuality: Double = 0.2, maxHamming: Int = 3): CurationSummary = {
    require(maxHamming <= 3,
      s"maxHamming must be <= 3 (SimHash 4-band pigeonhole), got $maxHamming")
    // 1.+2. one-pass annotation (shared with the streaming twin), then
    // the quality gate
    val gated = annotate(docs)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .filter(col("quality") >= minQuality)
      .persist()
    try {
      // 3. exact dedup, deterministic keeper (min doc_id per content
      // hash), aggregate form + slim semi-join — see scaladoc
      val keepers = gated
        .groupBy(md5(col("text")).as("_h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val exact = gated.join(keepers, Seq("doc_id"), "left_semi").persist()
      try {
        // 4. near-dup clusters → keep one doc per cluster
        val pairs = ScalableDedup.simhashCandidates(
          exact.select(col("doc_id"), col("toks")), "doc_id", "toks", maxHamming)
        val repl = DedupClusters.replacementMap(pairs, "a_id", "b_id")
          .withColumnRenamed("id", "doc_id")
        val curated = exact.join(repl, Seq("doc_id"), "left_anti")
          .drop("toks").persist()
        try {
          // 5. outputs
          curated.write.mode("overwrite").parquet(s"$outDir/corpus")
          curated.groupBy(col("lang_pred"))
            .agg(count(lit(1)).as("docs"),
              round(avg(col("quality")), 4).as("avg_quality"),
              round(avg(length(col("text"))), 2).as("avg_chars"))
            .write.mode("overwrite").parquet(s"$outDir/lang_stats")
          CurationSummary(
            input = docs.count(),
            afterQuality = gated.count(),
            afterExactDedup = exact.count(),
            curated = curated.count(),
            nearDupMembersRemoved = repl.count())
        } finally curated.unpersist()
      } finally exact.unpersist()
    } finally gated.unpersist()
  }
}
