package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ScalableDedup

/** Pair-volume diagnostics for the judged MinHash-LSH pipeline —
  * `runMain graft.LshStats <sfDir>` prints one JSON line with the
  * measured candidate/dup-pair counts and rescore work at that SF.
  *
  * Purpose: the LSH chain is the only part of the suite whose cost is
  * driven by PAIR volume rather than row volume, so scale claims about
  * it ("the sf1 wall ratio is pair growth, not a plan pathology") must
  * cite measured pair counts, not plan shape. BASELINE.md's Round-11
  * sf1 section carries this tool's output.
  */
object LshStats {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.ShingleHash32Expr.shingle_hash32(col("text"), 4).as("hs"))
      .localCheckpoint(true)
    val nDocs = docs.count()
    val cand = ScalableDedup.minhashBandedCandidates(
      docs, "doc_id", "hs", bands = 4, rowsPerBand = 4).localCheckpoint(true)
    val nCand = cand.count()
    // the same size-ratio prefilter + rescore the judged query runs;
    // "work" = Σ (na+nb) over surviving pairs — the two-pointer merge's
    // exact cost model
    val sized = cand
      .join(docs.select(col("doc_id").as("a_id"), size(col("hs")).as("na")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), size(col("hs")).as("nb")), "b_id")
    val afterRatio = sized
      .filter(least(col("na"), col("nb")) * 5 >= greatest(col("na"), col("nb")) * 4)
    val stats = afterRatio.agg(
      count(lit(1)).as("n_rescored"),
      sum(col("na") + col("nb")).as("merge_work")).collect().head
    val nDup = graft.operators.TrainingData.dedupMinhashLsh(spark, sfDir).count()
    println(s"""{"sf_dir":"$sfDir","docs":$nDocs,"candidate_pairs":$nCand,""" +
      s""""rescored_pairs":${stats.getLong(0)},"merge_work":${stats.getLong(1)},""" +
      s""""dup_pairs":$nDup}""")
    spark.stop()
  }
}
