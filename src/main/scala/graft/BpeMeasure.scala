package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Measures BPE encode throughput — the committed record behind the
  * loaded-table kernel's design choice (PqMeasure tradition: measure
  * the claim, don't argue it). Three rows on identical documents:
  *
  *  - `compiled16`: the pinned compile-time 16-rule kernel (the judged
  *    path), one in-order pass per rule — O(len × rules).
  *  - `table16`: the SAME 16 rules through the loaded-table
  *    lowest-rank-first kernel (BpeTable) — the equivalence pair.
  *  - `table2016`: 16 pinned + 2000 synthetic rules through the loaded
  *    table — the production-vocabulary shape. The rank loop's cost is
  *    table-size independent (a 126× bigger table must NOT cost 126×),
  *    which is exactly what a 50k-rule vocabulary needs; the record
  *    documents the measured ratio.
  *
  * Usage: runMain graft.BpeMeasure [rows]
  * Prints one JSON line {"metric":"bpe_encode",...}.
  */
object BpeMeasure {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic prose-shaped rows: words drawn from a lattice over
    // a merge-rich vocabulary, ~180 chars per row
    val words = Seq("the", "thing", "standing", "another", "chest",
      "resting", "north", "south", "orange", "house", "ground", "string")
    val wordArr = typedLit(words)
    val docs = spark.range(n).select($"id",
      concat_ws(" ", transform(sequence(lit(0), lit(23)),
        i => element_at(wordArr, (($"id" * 31 + i * 17) % words.size + 1).cast("int"))))
        .as("text"))
    val avgChars = docs.select(avg(length($"text"))).head.getDouble(0)

    val bigMerges = Bpe.Merges ++ (0 until 2000).map(i =>
      (0x3400 + i).toChar.toString -> (0x4E00 + i).toChar.toString)

    def best3(f: => Long): (Double, Long) = {
      var check = f // warmup (codegen + JIT)
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime; check = f; (System.nanoTime - t0) / 1e9
      }.min
      (t, check)
    }
    // the consuming SUM forces every row's count to materialize while
    // shipping one number back to the driver
    val (tCompiled, c0) = best3(
      docs.select(Bpe.bpeTokenCount($"text").as("n")).agg(sum($"n")).head.getLong(0))
    val (tTable16, c1) = best3(
      docs.select(Bpe.bpeTokenCountTable($"text", Bpe.Merges).as("n"))
        .agg(sum($"n")).head.getLong(0))
    val (tTable2016, c2) = best3(
      docs.select(Bpe.bpeTokenCountTable($"text", bigMerges).as("n"))
        .agg(sum($"n")).head.getLong(0))
    require(c0 == c1 && c1 == c2,
      s"kernels disagree: compiled=$c0 table16=$c1 table2016=$c2")

    def mbps(t: Double): Double =
      math.round(n * avgChars / t / 1e6 * 100) / 100.0
    def rps(t: Double): Long = math.round(n / t)
    println(
      s"""{"metric":"bpe_encode","rows":$n,"avg_chars":${math.round(avgChars)},""" +
      s""""total_tokens":$c0,""" +
      s""""compiled16_s":${math.round(tCompiled * 1000) / 1000.0},"compiled16_rows_per_s":${rps(tCompiled)},"compiled16_mb_per_s":${mbps(tCompiled)},""" +
      s""""table16_s":${math.round(tTable16 * 1000) / 1000.0},"table16_rows_per_s":${rps(tTable16)},"table16_mb_per_s":${mbps(tTable16)},""" +
      s""""table2016_s":${math.round(tTable2016 * 1000) / 1000.0},"table2016_rows_per_s":${rps(tTable2016)},"table2016_mb_per_s":${mbps(tTable2016)},""" +
      s""""table2016_over_table16":${math.round(tTable2016 / tTable16 * 100) / 100.0}}""")
    spark.stop()
  }
}
