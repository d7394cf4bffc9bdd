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
  *     modality (image aHash, audio energy fingerprint, video
  *     majority-vote frame hash — signatures from DIFFERENT modalities
  *     never meet, their hamming distance is meaningless), never an
  *     all-pairs comparison;
  *  3. duplicate clusters resolve with the same large-star/small-star
  *     contraction as text dedup (DedupClusters), keeping min media_id;
  *  4. outputs are `outDir/curated` and `outDir/quarantine`.
  */
object MediaPipeline {

  case class MediaCurationSummary(input: Long, decodable: Long,
      nearDupRemoved: Long, curated: Long)

  case class MediaAppendSummary(batchInput: Long, decodable: Long,
      newContent: Long, dupOfHistory: Long, accepted: Long)

  case class MediaQuarantine(media_id: Long, format: String, error: String)

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Lowercase hex of `bytes` — byte-identical to Spark's `md5()` output
    * for a digest, without the per-byte format-string parse a
    * `"%02x".format` chain would pay on every row. */
  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexDigits(b >> 4)
      out(i * 2 + 1) = HexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** One decode-bounded validation + downscale pass:
    * (row', ok, error, md5-of-ORIGINAL-payload). A failed decode — or a
    * null payload — is data (a quarantine row), not an exception. The
    * exact-dedup hash is taken BEFORE the downscale, so the same
    * ingested payload dedups identically whatever maxSide the run used;
    * only the append path consumes it, so [[curate]] passes
    * `withHash = false` and skips the full-payload md5 entirely. */
  private def validateAndResize(media: org.apache.spark.sql.Dataset[MediaRow],
      maxSide: Int, withHash: Boolean): org.apache.spark.sql.Dataset[(MediaRow, Boolean, String, String)] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = if (withHash)
        java.security.MessageDigest.getInstance("MD5") // per partition
      else null
      rows.map { r =>
        if (r.media == null) (r, false, "null media payload", "")
        else {
          val h = if (withHash) hex(md.digest(r.media)) else ""
          val fmt = Option(r.format).map(_.toLowerCase).getOrElse("")
          try {
            val out = fmt match {
              case "wav" =>
                Multimodal.wavLayout(r.media) // validate only
                r
              case "avi" =>
                Multimodal.aviLayout(r.media) // validate only
                r
              case "png" =>
                // real PNG downscale (alpha averaged, not dropped); the
                // resize's full decode IS the validation — a corrupt PNG
                // quarantines here, not mid-dedup — and it bounds the
                // later aHash decode to maxSide, like the BMP arm.
                // pngLayout for dims is header+CRC only, no re-inflate.
                val resized = Multimodal.pngResize(r.media, maxSide)
                val (pw, ph, _, _) = Multimodal.pngLayout(resized)
                if ((resized eq r.media) && r.width == pw && r.height == ph) r
                else r.copy(media = resized, width = pw, height = ph)
              case "bmp" =>
                val resized = Multimodal.bmpResize(r.media, maxSide)
                if (resized eq r.media) r
                else {
                  val (w2, h2, _, _, _) = Multimodal.bmpLayout(resized)
                  r.copy(media = resized, width = w2, height = h2)
                }
              case _ => r // opaque formats pass through (stub decode path)
            }
            (out, true, "", h)
          } catch {
            // NonFatal, not just IllegalArgumentException: the quarantine
            // contract is "one bad payload never kills the job", and a
            // decoder defect surfacing as AIOOBE/BufferUnderflow must land
            // in quarantine like a validation failure would
            case scala.util.control.NonFatal(e) => (r, false, e.toString, h)
          }
        }
      }
    }
  }

  /** Per-modality perceptual signatures: (media_id, sig, modality) —
    * image aHash, audio energy fingerprint, video majority-vote frame
    * hash; opaque formats carry no perceptual signature. */
  private def perceptualSigs(media: org.apache.spark.sql.Dataset[MediaRow]) = {
    import org.apache.spark.sql.functions.lit
    Multimodal.imageAHashes(media).withColumn("modality", lit("image"))
      .union(Multimodal.audioHashes(media).withColumn("modality", lit("audio")))
      .union(Multimodal.videoHashes(media).withColumn("modality", lit("video")))
  }

  def curate(spark: SparkSession, media: org.apache.spark.sql.Dataset[MediaRow],
      outDir: String, maxSide: Int = 512, maxHamming: Int = 3): MediaCurationSummary = {
    import spark.implicits._
    // parameter + path validation BEFORE any write: a bad argument must
    // not leave a half-overwritten outDir, and overwrite must never
    // delete the files the input itself is read from
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in 0..3 (4-band pigeonhole), got $maxHamming")
    require(maxSide > 0, s"maxSide must be positive, got $maxSide")
    // only the CONCRETE write targets are guarded — raw media kept under
    // e.g. `$outDir/raw` beside the curated output is a legal layout
    graft.PathGuard.requireDisjointFromAll(spark, media.inputFiles.toSeq,
      Seq(s"$outDir/curated", s"$outDir/quarantine"), "input media",
      "Curate into a directory whose curated/quarantine subdirs do not " +
        "hold the input.")
    // 1. strict validation + real BMP downscale, one pass (no payload
    // hashing — full-corpus curation dedups perceptually, not exactly)
    val checked = validateAndResize(media, maxSide, withHash = false)
      .persist() // feeds the quarantine write, both signature passes, and counts
    try {
      checked.filter(!_._2)
        .map(t => MediaQuarantine(t._1.media_id, t._1.format, t._3))
        .toDF().write.mode("overwrite").parquet(s"$outDir/quarantine")
      val good = checked.filter(_._2).map(_._1).persist()
      try {
        // 2.+3. near-dup clusters per modality, one replacement map
        val pairs = Multimodal.imageNearDups(good, maxHamming)
          .union(Multimodal.audioNearDups(good, maxHamming))
          .union(Multimodal.videoNearDups(good, maxHamming))
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

  /** Version stamp of the media signature-store encoding. Bump whenever
    * the meaning of `_h` or `sig` changes — signatures are persisted
    * state, and joining a batch hashed one way against history hashed
    * another way mis-dedups SILENTLY (spurious near-dup hits, missed
    * exact dups), which is why [[appendBatch]] refuses version-less or
    * mismatched stores instead of proceeding.
    *
    * v2: `_h` = md5 of the ORIGINAL (pre-downscale) payload; audio `sig`
    * = 28 rising / 28 falling / 8 thermometer bits (Multimodal
    * .wavEnergyHash). Round 7 extended image-sig COVERAGE to PNG rows
    * (same aHash encoding over the same pixel grid — a BMP and a PNG of
    * identical pixels carry identical sigs, so no version bump: stores
    * built earlier merely lack sigs for their PNG items, which then
    * dedup exact-only against new batches, a miss, never a mis-match).
    * Stores written before versioning (post-resize
    * md5, 64 energy-delta bits) have no `sig_v` column and must be
    * rebuilt by re-ingesting their corpus. */
  val SignatureVersion = 2

  /** Media signature-store schema: one row per media item ever admitted —
    * (media_id, payload md5, perceptual modality + 64-bit sig; opaque
    * formats carry a null sig and participate only in exact dedup),
    * stamped with [[SignatureVersion]]. This is the ONLY state
    * append-mode media curation keeps: at 100 TB you re-hash nothing;
    * each new batch joins against ~50 bytes/item. */
  def emptyMediaSignatureStore(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("media_id", LongType, nullable = false),
        StructField("_h", StringType, nullable = false),
        StructField("modality", StringType, nullable = true),
        StructField("sig", LongType, nullable = true),
        StructField("sig_v", IntegerType, nullable = false))))
  }

  /** Fail fast on a signature store whose encodings this code cannot
    * join against: no `sig_v` column (pre-versioning store) or any row
    * stamped with a different version (partially-migrated store). The
    * content check is one column-pruned scan that parquet min/max stats
    * short-circuit when — as always for intact stores — `sig_v` is
    * constant. */
  private def requireStoreVersion(store: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    require(store.columns.contains("sig_v"),
      "media signature store has no sig_v column: it was written before " +
        "store versioning, when _h was the post-resize md5 and audio sigs " +
        "used a different bit layout. Joining it against batches hashed " +
        s"the v$SignatureVersion way would mis-dedup silently — rebuild " +
        "the store by re-ingesting its corpus.")
    // null-safe: a delta-union where only SOME generations carry sig_v
    // surfaces as null rows, which are just as alien as a wrong number
    val alien = store.select(col("sig_v"))
      .filter(!(col("sig_v") <=> org.apache.spark.sql.functions.lit(SignatureVersion)))
      .limit(1)
    require(alien.isEmpty,
      s"media signature store contains rows with sig_v != $SignatureVersion " +
        s"(e.g. ${alien.collect().headOption.map(_.get(0)).getOrElse("?")}): " +
        "mixed-version stores mis-dedup silently — rebuild the store by " +
        "re-ingesting its corpus.")
  }

  /** Append-mode media curation — dedup an incoming batch against the
    * HISTORICAL signature store instead of re-hashing the whole corpus,
    * mirroring CorpusPipeline.appendBatch's semantics: exact dedup
    * (within batch, then anti-join on the store's payload hashes) →
    * per-modality banded near-dup vs the store AND within the batch
    * (batch clusters touching history are dropped entirely; remaining
    * clusters keep min media_id) → `outDir/accepted`, `outDir/quarantine`
    * and `outDir/signatures` (full grown store, or only this batch's
    * rows with `deltaSignatures` — the streaming-ingest mode where the
    * reader unions generation deltas). Use a fresh outDir per batch. */
  def appendBatch(spark: SparkSession, store: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.Dataset[MediaRow], outDir: String,
      maxSide: Int = 512, maxHamming: Int = 3,
      deltaSignatures: Boolean = false): MediaAppendSummary = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in 0..3 (4-band pigeonhole), got $maxHamming")
    require(maxSide > 0, s"maxSide must be positive, got $maxSide")
    graft.PathGuard.requireDisjoint(spark, store.inputFiles.toSeq, outDir,
      "media signature store")
    graft.PathGuard.requireDisjoint(spark, batch.inputFiles.toSeq, outDir,
      "input batch")
    requireStoreVersion(store)
    val checked = validateAndResize(batch, maxSide, withHash = true).persist()
    try {
      checked.filter(!_._2)
        .map(t => MediaQuarantine(t._1.media_id, t._1.format, t._3))
        .toDF().write.mode("overwrite").parquet(s"$outDir/quarantine")
      // _h is the md5 of the ORIGINAL payload (computed in the validate
      // pass), so identical ingested bytes dedup whatever maxSide is
      val withH = checked.filter(_._2)
        .map(t => (t._1, t._4)).toDF("r", "_h")
        .select(col("r.*"), col("_h")).persist()
      try {
        // exact dedup: min-id keeper per payload hash inside the batch,
        // then drop payloads the store has already seen
        val keepIds = withH.groupBy(col("_h"))
          .agg(min(col("media_id")).as("media_id")).select(col("media_id"))
        val newContent = withH
          .join(keepIds, Seq("media_id"), "left_semi")
          .join(store.select(col("_h")).distinct(), Seq("_h"), "left_anti")
          .persist()
        try {
          val newSigs = perceptualSigs(
            newContent.drop("_h").as[MediaRow]).persist()
          try {
            // near-dup vs history: per-modality band equi-join against
            // the store's perceptual signatures, exact hamming recheck
            val bNew = graft.operators.ScalableDedup.simhashBands(
              newSigs, "sig", Seq("media_id", "modality", "sig"))
            val bOld = graft.operators.ScalableDedup.simhashBands(
                store.filter(col("sig").isNotNull)
                  .select(col("media_id").as("h_id"), col("modality"), col("sig")),
                "sig", Seq("h_id", "modality", "sig"))
              .withColumnRenamed("sig", "h_sig")
            val dupOfHistory = bNew.join(bOld, Seq("modality", "band", "bits"))
              .filter(bit_count(col("sig").bitwiseXOR(col("h_sig"))) <= maxHamming)
              .select(col("media_id")).distinct().persist()
            try {
              // within-batch clusters per modality; a history-dup drags
              // its whole batch cluster into the history cluster
              val pairs = Seq("image", "audio", "video").map { m =>
                graft.operators.ScalableDedup.simhashCandidatesFromSigs(
                  newSigs.filter(col("modality") === m)
                    .select(col("media_id"), col("sig")),
                  "media_id", "sig", maxHamming)
              }.reduce(_ union _)
              val keepers = graft.operators.DedupClusters.appendKeepers(
                newContent, "media_id", pairs, "a_id", "b_id", dupOfHistory)
              val accepted = newContent
                .join(keepers, Seq("media_id"), "left_semi").persist()
              try {
                accepted.drop("_h")
                  .write.mode("overwrite").parquet(s"$outDir/accepted")
                // the store grows with every distinct-payload item, kept
                // or dropped — exactly like the text store
                val newStoreRows = newContent.select(col("media_id"), col("_h"))
                  .join(newSigs.select(col("media_id"), col("modality"), col("sig")),
                    Seq("media_id"), "left")
                  .withColumn("sig_v", lit(SignatureVersion))
                (if (deltaSignatures) newStoreRows
                 else store.unionByName(newStoreRows))
                  .write.mode("overwrite").parquet(s"$outDir/signatures")
                MediaAppendSummary(
                  batchInput = checked.count(),
                  decodable = withH.count(),
                  newContent = newContent.count(),
                  dupOfHistory = dupOfHistory.count(),
                  accepted = accepted.count())
              } finally { accepted.unpersist(); () }
            } finally { dupOfHistory.unpersist(); () }
          } finally { newSigs.unpersist(); () }
        } finally { newContent.unpersist(); () }
      } finally { withH.unpersist(); () }
    } finally { checked.unpersist(); () }
  }
}
