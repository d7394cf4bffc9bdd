package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents whose character
  * n-gram shingles are largely CONTAINED in some benchmark document —
  * the standard "did evaluation data leak into training data" check.
  *
  * Containment(doc, bench) = |shingles(doc) ∩ shingles(bench)| /
  * |shingles(doc)|; a document is contaminated when its max containment
  * over the benchmark set reaches the threshold.
  *
  * Scale shape: explode both sides to (id, shingle) rows and equi-join on
  * the shingle — never an all-pairs document comparison. Each side's
  * shingles are distinct per document, so a plain count per (doc, bench)
  * pair IS the intersection size. On a real corpus longer shingles
  * (n ≈ 8-13 in published pipelines) are near-unique, which keeps the
  * shingle buckets flat; the synthetic 40-word-vocabulary corpus is the
  * adversarial case, which is why the judged query runs on a bounded
  * window (same precedent as the other pairwise dedup oracles).
  */
object Decontaminate {

  /** Distinct character n-gram shingles (same construction as the judged
    * dedup_ngram_jaccard recipe, cross-engine checkable). */
  def shingleSet(textCol: String, n: Int): Column = expr(
    s"array_distinct(transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), " +
      s"i -> substring($textCol, i, $n)))")

  /** Per-corpus-document max containment against the benchmark set.
    * Documents sharing no shingle with any benchmark doc are omitted
    * (their containment is 0). Output: (idCol, containment). */
  def maxContainment(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // collision-safe working names: idCol may be anything
    val gC = GlobalRank.fresh(corpus, "_g")
    val nC = GlobalRank.fresh(corpus, "_n")
    val bidC = GlobalRank.fresh(corpus, "_bid")
    val interC = GlobalRank.fresh(corpus, "_inter")
    val cSh = corpus.select(col(idCol), shingleSet(textCol, n).as("sh"))
      .select(col(idCol), size(col("sh")).as(nC), explode(col("sh")).as(gC))
    val bSh = benchmark.select(col(idCol).as(bidC), explode(shingleSet(textCol, n)).as(gC))
    cSh.join(bSh, Seq(gC))
      .groupBy(col(idCol), col(bidC), col(nC))
      .agg(count(lit(1)).as(interC))
      .groupBy(col(idCol))
      .agg(max(col(interC).cast("double") / col(nC)).as("containment"))
  }

  /** Corpus rows whose max containment is at least `minContainment` —
    * the rows to QUARANTINE before training. (Raw containment compare;
    * the judged query wrapper applies its oracle's 6-decimal rounding
    * before filtering.) */
  def contaminated(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 3, minContainment: Double = 0.8): DataFrame =
    maxContainment(corpus, benchmark, idCol, textCol, n)
      .filter(col("containment") >= minContainment)
}
