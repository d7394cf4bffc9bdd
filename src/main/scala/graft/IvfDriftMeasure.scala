package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the IVF index lifecycle under EMBEDDING DRIFT — the
  * operating question `indexStats.rebuildRecommended` answers by
  * heuristic, here answered by measurement (the PqMeasure/SkewMeasure
  * tradition): how fast does recall@k at fixed nprobe decay as
  * appended generations shift away from the fitted centroids, and how
  * much does a rebuild recover?
  *
  * Setup: a base corpus of 16 synthetic clusters; each appended
  * generation adds vectors whose cluster centers are TRANSLATED by a
  * growing drift vector (the re-embedded/new-domain scenario). The
  * measured finding (committed as docs/ivf_drift_r15.json): RECALL is
  * drift-robust — probe and neighbors misroute TOGETHER, so consistent
  * routing keeps recall@10 at 1.0 across every state — but SCAN COST
  * degenerates: drifted vectors pile into the few old lists nearest
  * the shifted region, list imbalance grows, and the fraction of the
  * corpus scanned at fixed nprobe climbs toward brute force. That is
  * the decay mode rebuildRecommended protects against: drift costs
  * you the index's EFFICIENCY before it costs you its answers, and a
  * rebuild restores both balance and the ~nprobe/nlist scan fraction.
  *
  * Usage: runMain graft.IvfDriftMeasure [baseRows] [genRows] [gens]
  * Prints one JSON line {"metric":"ivf_drift",...} with recall@10,
  * scanned fraction, and list imbalance per state, the stats flag,
  * and the post-rebuild recovery.
  */
object IvfDriftMeasure {
  def main(args: Array[String]): Unit = {
    val baseRows = if (args.length > 0) args(0).toInt else 8000
    val genRows = if (args.length > 1) args(1).toInt else 4000
    val gens = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dim = 32
    val k = 10
    val nprobe = 4
    val nlist = 16

    // cluster c center: sin(c·1.7 + t·0.5); noise keeps neighbors real;
    // drift g translates every gen-g center by g·1.5·cos(t·0.37 + g)
    def vecs(n: Int, idBase: Long, drift: Int, noise: Double): DataFrame =
      spark.range(n).select(($"id" + idBase).as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), t =>
          (sin((($"id" + idBase) % nlist) * 1.7 + t * 0.5)
            + lit(noise) * sin(($"id" + idBase) * 7.3 + t * 1.3)
            + lit(drift * 1.5) * cos(t * 0.37 + drift))
            .cast("float")).as("embedding"))

    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_drift").toString + "/idx"
    val base = vecs(baseRows, 0L, drift = 0, noise = 0.1)
    graft.operators.Ann.buildIvfIndex(spark, base, "vec_id", "embedding",
      dir, nlist = nlist)

    def recallNow(corpus: DataFrame, probeDrift: Int): Double = {
      // probes from the LATEST distribution, ids disjoint from the corpus
      val probes = vecs(40, 9000000L, probeDrift, noise = 0.11)
      def pairs(df: DataFrame): Map[Long, Set[Long]] =
        df.select(col("probe_id"), col("nb")).collect()
          .groupBy(_.getLong(0)).map { case (p, rs) =>
            p -> rs.map(_.getLong(1)).toSet
          }
      val truth = pairs(graft.operators.Ann.bruteForceTopK(
        corpus, probes, "vec_id", "embedding", k))
      val got = pairs(graft.operators.Ann.ivfTopKIndexed(
        spark, dir, probes, "vec_id", "embedding", k, nprobe))
      val rs = truth.map { case (p, t) =>
        got.getOrElse(p, Set.empty).intersect(t).size.toDouble / k
      }
      rs.sum / rs.size
    }

    /** (scanned fraction at nprobe, max/mean list-size imbalance): the
      * efficiency half of the lifecycle. Routing replayed from the
      * PUBLIC index artifacts (centroids + list sizes), driver-side —
      * 40 probes × nlist centroids. */
    def costNow(probeDrift: Int): (Double, Double) = {
      val centroids = spark.read.parquet(s"$dir/centroids")
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      val sizes = spark.read.parquet(s"$dir/lists")
        .groupBy(col("list_id")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val total = sizes.values.sum.toDouble
      val probeVs = vecs(40, 9000000L, probeDrift, noise = 0.11)
        .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
      val fracs = probeVs.map { pv =>
        val near = centroids.sortBy { case (_, cv) =>
          cv.zip(pv).map { case (a, b) => (a - b) * (a - b) }.sum
        }.take(nprobe).map(_._1)
        near.map(l => sizes.getOrElse(l, 0L)).sum / total
      }
      val mean = total / sizes.size
      (fracs.sum / fracs.length, sizes.values.max / mean)
    }

    var corpus = base
    val recalls = scala.collection.mutable.ArrayBuffer[Double]()
    val scanned = scala.collection.mutable.ArrayBuffer[Double]()
    val imbalance = scala.collection.mutable.ArrayBuffer[Double]()
    val flags = scala.collection.mutable.ArrayBuffer[Boolean]()
    def measureState(probeDrift: Int): Unit = {
      recalls += recallNow(corpus, probeDrift)
      val (f, im) = costNow(probeDrift)
      scanned += f
      imbalance += im
      flags += graft.operators.Ann.indexStats(spark, dir).rebuildRecommended
    }
    measureState(0)
    (1 to gens).foreach { g =>
      val genDf = vecs(genRows, 1000000L * g, drift = g, noise = 0.1)
      graft.operators.Ann.appendToIvfIndex(spark, genDf, "vec_id",
        "embedding", dir, generation = g.toLong)
      corpus = corpus.unionByName(genDf)
      measureState(g)
    }
    // rebuild over the FULL drifted corpus, then re-measure at the
    // latest distribution — the recovery the flag is asking for
    graft.operators.Ann.buildIvfIndex(spark, corpus, "vec_id", "embedding",
      dir, nlist = nlist)
    val recovered = recallNow(corpus, probeDrift = gens)
    val (fRec, imRec) = costNow(probeDrift = gens)

    println(s"""{"metric":"ivf_drift","dim":$dim,"nlist":$nlist,"k":$k,""" +
      s""""nprobe":$nprobe,"base_rows":$baseRows,"gen_rows":$genRows,""" +
      s""""recall_by_state":[${recalls.map(r => f"$r%.3f").mkString(",")}],""" +
      s""""scanned_frac_by_state":[${scanned.map(r => f"$r%.3f").mkString(",")}],""" +
      s""""imbalance_by_state":[${imbalance.map(r => f"$r%.2f").mkString(",")}],""" +
      s""""rebuild_recommended":[${flags.mkString(",")}],""" +
      f""""recall_after_rebuild":$recovered%.3f,""" +
      f""""scanned_frac_after_rebuild":$fRec%.3f,""" +
      f""""imbalance_after_rebuild":$imRec%.2f}""")
    spark.stop()
  }
}
