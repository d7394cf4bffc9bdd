package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the two round-16 crawl-chain claims instead of arguing
  * them (the AvroMeasure/PqMeasure tradition):
  *
  *   1. "Charset correctness is free at 100 TB" — charset-aware decode
  *      (graft.sources.HttpCharset: BOM probe + header/meta sniff +
  *      CharsetDecoder) against the blind `new String(bytes, UTF-8)`
  *      baseline, same body bytes, same Spark shape (one map + count).
  *   2. Robots evaluation cost per page — RFC 9309 decision via the
  *      per-executor compiled-rules memo (graft.sources.Robots),
  *      measured in pages/s against a no-op length baseline.
  *
  * Usage: runMain graft.CrawlMeasure [replicate]
  * Prints one JSON line {"metric":"crawl_measure",...}.
  */
object CrawlMeasure {
  def main(args: Array[String]): Unit = {
    val replicate = if (args.length > 0) args(0).toInt else 400
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ~64k bodies, ~1 KB each, mixed charsets (the judged six shapes)
    val n = 164 * replicate
    val mkBody = udf { (i: Long) =>
      val pad = ("lorem " * 40) + ("ipsum " * 40) + ("x" * 200)
      val text = s"<html><head><title>M$i</title></head><body><p>m $i " +
        s"café € $pad</p></body></html>"
      val v = (i % 6).toInt
      val ctype = v match {
        case 0 => "text/html; charset=utf-8"
        case 1 => "text/html; charset=windows-1252"
        case 3 => "text/html; charset=iso-8859-1"
        case _ => "text/html"
      }
      val body: Array[Byte] = v match {
        case 0 => text.getBytes("UTF-8")
        case 1 | 2 | 4 => text.getBytes("windows-1252")
        case 3 =>
          val b = text.getBytes("UTF-8")
          Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ b
        case _ =>
          val b = text.getBytes("UTF-16LE")
          Array[Byte](0xFF.toByte, 0xFE.toByte) ++ b
      }
      (ctype, body)
    }
    val bodies = spark.range(n)
      .select(mkBody(col("id")).as("m"))
      .select(col("m._1").as("ctype"), col("m._2").as("body"))
      .cache()
    val totalBytes = bodies.select(sum(length(col("body")))).as[Long].head()

    val blind = udf { (b: Array[Byte]) => new String(b, "UTF-8").length }
    val aware = udf { (ct: String, b: Array[Byte]) =>
      graft.sources.HttpCharset.decode(ct, b)._2.length }

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // warm both paths (JIT + cache materialization), then measure twice
    bodies.select(sum(blind(col("body")))).as[Long].head()
    bodies.select(sum(aware(col("ctype"), col("body")))).as[Long].head()
    val (tBlind, _) = time(
      bodies.select(sum(blind(col("body")))).as[Long].head())
    val (tAware, _) = time(
      bodies.select(sum(aware(col("ctype"), col("body")))).as[Long].head())

    // robots: same fixture shape as the judged row, 7 distinct hosts
    val robotsTxt = udf { (i: Long) =>
      val s = i % 7
      s"User-agent: otherbot\nDisallow: /\n\nUser-agent: graftbot\n" +
        s"Disallow: /private/\nAllow: /private/ok/\nDisallow: /cat/$s/\n" +
        s"Disallow: /*.pdf$$\nDisallow: /dl/*/raw\n\nUser-agent: *\nDisallow: /none/\n"
    }
    val pages = spark.range(n).select(
      robotsTxt(col("id")).as("robots"),
      concat(lit("/cat/"), (col("id") % 7).cast("string"),
        lit("/item"), col("id").cast("string")).as("path")).cache()
    pages.count()
    val evalRobots = udf { (r: String, p: String) =>
      if (graft.sources.Robots.allowed(r, "graftbot", p)) 1L else 0L }
    val baseline = udf { (r: String, p: String) => (r.length + p.length).toLong }
    pages.select(sum(evalRobots(col("robots"), col("path")))).as[Long].head()
    val (tBase, _) = time(
      pages.select(sum(baseline(col("robots"), col("path")))).as[Long].head())
    val (tRobots, _) = time(
      pages.select(sum(evalRobots(col("robots"), col("path")))).as[Long].head())

    val mb = totalBytes / 1e6
    // The no-op baseline run isolates the Spark scan/UDF overhead the
    // robots figure must NOT absorb: the raw pages/s divides by the
    // whole eval wall (includes that overhead), the _adj figure by
    // (tRobots − tBase) — the robots evaluation cost alone. When the
    // difference is at or below the noise floor (the memo'd eval can
    // even measure FASTER than the no-op on a warm run), the honest
    // answer is "unresolvable at this n", emitted as null rather than
    // a clamped-divisor fiction.
    val isolated = tRobots - tBase
    val adj =
      if (isolated > 0.02) f"${n / isolated}%.0f" else "null"
    println(
      s"""{"metric":"crawl_measure","bodies":$n,"mb":${f"$mb%.1f"},""" +
      s""""decode_blind_sec":${f"$tBlind%.3f"},"decode_aware_sec":${f"$tAware%.3f"},""" +
      s""""blind_mb_s":${f"${mb / tBlind}%.1f"},"aware_mb_s":${f"${mb / tAware}%.1f"},""" +
      s""""aware_over_blind":${f"${tAware / tBlind}%.3f"},""" +
      s""""robots_pages":$n,"robots_base_sec":${f"$tBase%.3f"},""" +
      s""""robots_eval_sec":${f"$tRobots%.3f"},""" +
      s""""robots_isolated_sec":${f"$isolated%.3f"},""" +
      s""""robots_pages_s":${f"${n / tRobots}%.0f"},""" +
      s""""robots_pages_s_adj":$adj}""")
    spark.stop()
  }
}
