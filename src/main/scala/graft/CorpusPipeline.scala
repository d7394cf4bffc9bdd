package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *  3. exact dedup is a single shuffle on md5(text) — uniform key — with
  *     a deterministic min-doc_id keeper;
  *  4. near-dup removal shuffles on 16-bit SimHash bands
  *     (ScalableDedup.simhashCandidates — candidate pairs from bucket
  *     equi-joins, never all-pairs) and resolves duplicate CLUSTERS with
  *     min-label propagation (DedupClusters), dropping every non-keeper;
  *  5. outputs are the curated corpus and a per-language stats rollup.
  */
object CorpusPipeline {

  case class CurationSummary(input: Long, afterQuality: Long,
      afterExactDedup: Long, curated: Long, nearDupClustersRemoved: Long)

  /** Curate a document table (must have `doc_id` long and `text` string).
    *
    * @param minQuality  quality-score gate in [0,1]
    * @param maxHamming  SimHash hamming radius treated as near-duplicate
    */
  def curate(spark: SparkSession, docs: DataFrame, outDir: String,
      minQuality: Double = 0.2, maxHamming: Int = 3): CurationSummary = {
    // 1. one-pass annotation
    val annotated = docs
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .withColumn("fp", TextAnalysis.rollingFingerprint(col("text")))
      .withColumn("toks", TextFunctions.tokens(col("text")))

    // 2. quality gate
    val gated = annotated.filter(col("quality") >= minQuality)

    // 3. exact dedup, deterministic keeper (min doc_id per content hash):
    // one shuffle on the uniform md5 key
    val wDup = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val exact = gated.withColumn("_rn", row_number().over(wDup))
      .filter(col("_rn") === 1).drop("_rn")

    // 4. near-dup clusters → keep one doc per cluster
    val pairs = ScalableDedup.simhashCandidates(
      exact.select(col("doc_id"), col("toks")), "doc_id", "toks", maxHamming)
    val repl = DedupClusters.replacementMap(pairs, "a_id", "b_id")
      .withColumnRenamed("id", "doc_id")
    val curated = exact.join(repl, Seq("doc_id"), "left_anti").drop("toks")

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
      nearDupClustersRemoved = repl.count())
  }
}
