package graft.multimodal

import org.apache.spark.sql.SparkSession

import Multimodal.MediaRow

/** Media curation end to end — the multimodal analogue of
  * graft.CorpusPipeline: validate → (for BMP) real downscale → per-modality
  * near-dup removal → curated parquet + quarantine.
  *
  * Stage scale behavior:
  *  1. validation and the downscale run in ONE decode-bounded
  *     mapPartitions pass (errors become quarantine ROWS, not job
  *     failures — a single corrupt payload must not kill a 100 TB job);
  *  2. near-dup candidates come from the banded-hamming equi-join per
  *     modality (image aHash, audio energy fingerprint — signatures from
  *     DIFFERENT modalities never meet, their hamming distance is
  *     meaningless), never an all-pairs comparison;
  *  3. duplicate clusters resolve with the same large-star/small-star
  *     contraction as text dedup (DedupClusters), keeping min media_id;
  *  4. outputs are `outDir/curated` and `outDir/quarantine`.
  */
object MediaPipeline {

  case class MediaCurationSummary(input: Long, decodable: Long,
      nearDupRemoved: Long, curated: Long)

  case class MediaQuarantine(media_id: Long, format: String, error: String)

  def curate(spark: SparkSession, media: org.apache.spark.sql.Dataset[MediaRow],
      outDir: String, maxSide: Int = 512, maxHamming: Int = 3): MediaCurationSummary = {
    import spark.implicits._
    // 1. strict validation + real BMP downscale, one pass; a failed
    // decode is data (quarantine row), not an exception
    val checked = media.mapPartitions { rows =>
      rows.map { r =>
        val fmt = Option(r.format).map(_.toLowerCase).getOrElse("")
        try {
          val out = fmt match {
            case "wav" =>
              Multimodal.wavLayout(r.media) // validate only
              r
            case "bmp" =>
              val resized = Multimodal.bmpResize(r.media, maxSide)
              if (resized eq r.media) r
              else {
                val (w2, h2, _, _, _) = Multimodal.bmpLayout(resized)
                r.copy(media = resized, width = w2, height = h2)
              }
            case _ => r // opaque formats pass through (stub decode path)
          }
          (out, true, "")
        } catch {
          case e: IllegalArgumentException => (r, false, e.getMessage)
        }
      }
    }.persist() // feeds the quarantine write, both signature passes, and counts
    try {
      checked.filter(!_._2)
        .map(t => MediaQuarantine(t._1.media_id, t._1.format, t._3))
        .toDF().write.mode("overwrite").parquet(s"$outDir/quarantine")
      val good = checked.filter(_._2).map(_._1).persist()
      try {
        // 2.+3. near-dup clusters per modality, one replacement map
        val pairs = Multimodal.imageNearDups(good, maxHamming)
          .union(Multimodal.audioNearDups(good, maxHamming))
        val repl = graft.operators.DedupClusters
          .replacementMap(pairs, "a_media_id", "b_media_id")
          .withColumnRenamed("id", "media_id")
        val curated = good.toDF()
          .join(repl, Seq("media_id"), "left_anti").persist()
        try {
          curated.write.mode("overwrite").parquet(s"$outDir/curated")
          MediaCurationSummary(
            input = checked.count(),
            decodable = good.count(),
            nearDupRemoved = repl.count(),
            curated = curated.count())
        } finally { curated.unpersist(); () }
      } finally { good.unpersist(); () }
    } finally { checked.unpersist(); () }
  }
}
