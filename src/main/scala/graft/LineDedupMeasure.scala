package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Measures the round-17 keep-first dedup claim instead of arguing it
  * (the AvroMeasure/PqMeasure/CrawlMeasure tradition): corpus-wide
  * keep-first line dedup (the `text_line_dedup`/`dedup_c4_spans`
  * kernel) implemented two ways over a Zipf-hot corpus —
  *
  *   1. WINDOW form: `row_number() OVER (PARTITION BY line ORDER BY
  *      doc, pos) = 1` — one window partition per distinct line, so a
  *      boilerplate line repeated across a large share of the corpus
  *      SERIALIZES into one partition's sort (the skew victim).
  *   2. AGG form (shipped): `groupBy(line).agg(min(struct(doc, pos)))`
  *      + join-back on the unique (doc, pos) key — map-side partial
  *      combine absorbs the hot lines before the exchange.
  *
  * The fixture is the real-world shape: `hot` boilerplate lines (nav /
  * footer / cookie banner) each covering ~10% of all rows, plus a long
  * unique tail. Both forms must agree on the kept-count (asserted);
  * the JSON line records both walls and the ratio.
  *
  * MEASURED RESULT (round 17, docs/line_dedup_measure_r17.json): at
  * local[32] the WINDOW form is the faster one — 2.0 s vs 4.8 s at
  * 2.4M lines / 400k-hot keys, 2.1 s vs 3.5 s at 12M lines / 2M-hot
  * keys — because the agg form pays a second full shuffle (the
  * join-back) where the window pays one shuffle plus per-key sorts,
  * and an in-memory sort of a few-million-row hot partition is cheap.
  * The gap CLOSES as hot keys grow (2.42× → 1.64× for 5× hotter), and
  * the reason the shipped queries still use the agg form is not
  * local latency but the per-task bound: the window form's hot key is
  * ONE task's sort buffer — O(occurrences of the hottest line), the
  * thing that spills or OOMs when a cookie banner covers 10% of a
  * 100 TB corpus — while the agg form's partial min keeps every task
  * at O(distinct lines per task) regardless of skew (and AQE can
  * split the join's probe side, but can never split a window
  * partition). This artifact records the honest local trade so the
  * choice is a documented decision, not a guess.
  *
  * Usage: runMain graft.LineDedupMeasure [docs] (default 400k docs ×
  * 6 lines ≈ 2.4M lines). Prints one JSON line
  * {"metric":"line_dedup_measure",...}.
  */
object LineDedupMeasure {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 400000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 6 lines per doc: 3 GLOBAL boilerplate lines (each ~nDocs hot),
    // one per-site line (7 sites), two unique lines
    val lines = spark.range(nDocs).select(col("id").as("doc"),
        posexplode(array(
          lit("accept all cookies to continue"),
          lit("subscribe to our newsletter"),
          concat(lit("site "), (col("id") % 7).cast("string"),
            lit(" navigation home about contact")),
          concat(lit("unique body "), col("id").cast("string"), lit(" alpha "),
            ((col("id") * 17) % 99991).cast("string")),
          concat(lit("unique tail "), col("id").cast("string"), lit(" beta "),
            ((col("id") * 29) % 99991).cast("string")),
          lit("all rights reserved"))).as(Seq("pos", "line")))
      .cache()
    val total = lines.count()

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    def windowKept(): Long = {
      val w = Window.partitionBy(col("line"))
        .orderBy(col("doc"), col("pos"))
      lines.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).count()
    }
    def aggKept(): Long = {
      val winners = lines.groupBy(col("line"))
        .agg(min(struct(col("doc"), col("pos"))).as("w"))
        .select(col("w.doc").as("doc"), col("w.pos").as("pos"),
          lit(true).as("keep"))
      lines.join(winners, Seq("doc", "pos"), "left")
        .filter(col("keep")).count()
    }

    // warm both paths (JIT + cache materialization), then measure
    windowKept(); aggKept()
    val (tWin, kWin) = time(windowKept())
    val (tAgg, kAgg) = time(aggKept())
    require(kWin == kAgg, s"forms disagree: window=$kWin agg=$kAgg")

    println(
      s"""{"metric":"line_dedup_measure","docs":$nDocs,"lines":$total,""" +
      s""""kept":$kAgg,"window_sec":${f"$tWin%.3f"},""" +
      s""""agg_sec":${f"$tAgg%.3f"},""" +
      s""""agg_over_window":${f"${tAgg / tWin}%.3f"}}""")
    spark.stop()
  }
}
