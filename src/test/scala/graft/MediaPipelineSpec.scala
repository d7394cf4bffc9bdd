package graft

import graft.multimodal.{MediaPipeline, Multimodal}

class MediaPipelineSpec extends SparkSpecBase {

  private def bmp(f: (Int, Int) => (Int, Int, Int), side: Int = 16) =
    Multimodal.encodeBmp24(side, side, f)

  test("curate validates, downscales, dedups per modality, and quarantines") {
    val ramp = Array.tabulate[Short](260)(i => (10 + i * 25).toShort)
    val rampNoisy = ramp.clone(); rampNoisy(100) = (rampNoisy(100) + 30).toShort
    val rows = Seq(
      // near-dup image pair → keeper 1, drop 2
      Multimodal.MediaRow(1L, "image",
        bmp((x, _) => if (x < 8) (0, 0, 0) else (255, 255, 255)), "bmp", 16, 16, 0),
      Multimodal.MediaRow(2L, "image",
        bmp((x, y) => if ((x, y) == (1, 1)) (40, 40, 40)
          else if (x < 8) (0, 0, 0) else (255, 255, 255)), "bmp", 16, 16, 0),
      // orthogonal image → kept
      Multimodal.MediaRow(3L, "image",
        bmp((_, y) => if (y < 8) (255, 255, 255) else (0, 0, 0)), "bmp", 16, 16, 0),
      // near-dup audio pair → keeper 4, drop 5
      Multimodal.MediaRow(4L, "audio",
        Multimodal.encodeWavPcm16(ramp, 8000), "wav", 0, 0, 8000),
      Multimodal.MediaRow(5L, "audio",
        Multimodal.encodeWavPcm16(rampNoisy, 8000), "wav", 0, 0, 8000),
      // corrupt wav → quarantined, not crashed and not faked
      Multimodal.MediaRow(6L, "audio",
        Array.tabulate[Byte](80)(_.toByte), "wav", 0, 0, 8000),
      // opaque format → passes through on the stub path
      Multimodal.MediaRow(7L, "video",
        Array.tabulate[Byte](64)(i => (i * 3).toByte), "mp4", 8, 8, 0),
      // oversized diagonal-gradient image → downscaled to the cap, kept
      Multimodal.MediaRow(8L, "image",
        bmp((x, y) => (x * 4 % 256, y * 4 % 256, (x + y) * 2 % 256), side = 64),
        "bmp", 64, 64, 0))
    val out = java.nio.file.Files.createTempDirectory("media_cur").toString
    val s = MediaPipeline.curate(spark,
      spark.createDataset(rows)(org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]),
      out, maxSide = 32, maxHamming = 3)
    assert(s == MediaPipeline.MediaCurationSummary(
      input = 8, decodable = 7, nearDupRemoved = 2, curated = 5), s.toString)
    val curated = spark.read.parquet(s"$out/curated")
    import spark.implicits._
    assert(curated.select($"media_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 4L, 7L, 8L))
    // the oversized image was REALLY downscaled: payload decodes at 32px
    // and the metadata columns moved with it
    val r8 = curated.filter($"media_id" === 8L)
      .select($"media", $"width", $"height").head()
    val info = Multimodal.decodeBmp(r8.getAs[Array[Byte]](0))
    assert(info.width == 32 && info.height == 32)
    assert(r8.getInt(1) == 32 && r8.getInt(2) == 32)
    // the quarantine names the corrupt row with a real decoder error
    val q = spark.read.parquet(s"$out/quarantine").collect()
    assert(q.length == 1 && q.head.getLong(0) == 6L &&
      q.head.getString(2).contains("RIFF"), q.mkString(","))
  }

  test("append-mode media dedup against the signature store") {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]
    val imgA = bmp((x, _) => if (x < 8) (0, 0, 0) else (255, 255, 255))
    val imgANoisy = bmp((x, y) => if ((x, y) == (1, 1)) (40, 40, 40)
      else if (x < 8) (0, 0, 0) else (255, 255, 255))
    val imgOrtho = bmp((_, y) => if (y < 8) (255, 255, 255) else (0, 0, 0))
    val ramp = Array.tabulate[Short](260)(i => (10 + i * 25).toShort)
    val rampNoisy = ramp.clone(); rampNoisy(100) = (rampNoisy(100) + 30).toShort
    val mp4 = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val batch1 = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", imgA, "bmp", 16, 16, 0),
      Multimodal.MediaRow(2L, "audio",
        Multimodal.encodeWavPcm16(ramp, 8000), "wav", 0, 0, 8000),
      Multimodal.MediaRow(3L, "video", mp4, "mp4", 8, 8, 0)))(enc)
    val out1 = java.nio.file.Files.createTempDirectory("media_a1").toString
    val s1 = MediaPipeline.appendBatch(spark,
      MediaPipeline.emptyMediaSignatureStore(spark), batch1, out1)
    assert(s1 == MediaPipeline.MediaAppendSummary(3, 3, 3, 0, 3), s1.toString)

    val store = spark.read.parquet(s"$out1/signatures")
    val batch2 = spark.createDataset(Seq(
      Multimodal.MediaRow(11L, "image", imgA, "bmp", 16, 16, 0), // exact dup
      Multimodal.MediaRow(12L, "image", imgANoisy, "bmp", 16, 16, 0), // near-dup of history
      Multimodal.MediaRow(13L, "image", imgOrtho, "bmp", 16, 16, 0), // fresh
      Multimodal.MediaRow(14L, "audio",
        Multimodal.encodeWavPcm16(rampNoisy, 8000), "wav", 0, 0, 8000), // near-dup of history
      Multimodal.MediaRow(15L, "video", mp4, "mp4", 8, 8, 0)))(enc) // exact dup (opaque)
    val out2 = java.nio.file.Files.createTempDirectory("media_a2").toString
    val s2 = MediaPipeline.appendBatch(spark, store, batch2, out2)
    assert(s2 == MediaPipeline.MediaAppendSummary(
      batchInput = 5, decodable = 5, newContent = 3,
      dupOfHistory = 2, accepted = 1), s2.toString)
    assert(spark.read.parquet(s"$out2/accepted")
      .select($"media_id").as[Long].collect().toSeq == Seq(13L))
    // the grown store holds history + every distinct-payload batch item
    assert(spark.read.parquet(s"$out2/signatures").count() == store.count() + 3)
    // and refuses to overwrite its own input (shared PathGuard)
    val e = intercept[IllegalArgumentException] {
      MediaPipeline.appendBatch(spark, spark.read.parquet(s"$out2/signatures"),
        batch1, out2)
    }
    assert(e.getMessage.contains("fresh outDir"))
  }

  test("appendBatch refuses version-less and mixed-version signature stores") {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]
    val batch = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image",
        bmp((x, _) => if (x < 8) (0, 0, 0) else (255, 255, 255)),
        "bmp", 16, 16, 0)))(enc)
    // a store persisted before versioning has no sig_v column at all —
    // its _h/audio-sig encodings are incompatible, so fail fast
    val out = java.nio.file.Files.createTempDirectory("media_v0").toString
    val versionless = MediaPipeline.emptyMediaSignatureStore(spark).drop("sig_v")
    val e = intercept[IllegalArgumentException] {
      MediaPipeline.appendBatch(spark, versionless, batch, out)
    }
    assert(e.getMessage.contains("sig_v"), e.getMessage)
    // rows stamped with a different version are just as alien
    val stale = Seq((9L, "00" * 16, "image", 5L, 1))
      .toDF("media_id", "_h", "modality", "sig", "sig_v")
    val e2 = intercept[IllegalArgumentException] {
      MediaPipeline.appendBatch(spark, stale, batch, out)
    }
    assert(e2.getMessage.contains(
      s"sig_v != ${MediaPipeline.SignatureVersion}"), e2.getMessage)
    // and so are null stamps (a delta-union where only some generations
    // carry the column)
    val nulled = Seq((9L, "00" * 16, "image", Some(5L), Option.empty[Int]))
      .toDF("media_id", "_h", "modality", "sig", "sig_v")
    val e3 = intercept[IllegalArgumentException] {
      MediaPipeline.appendBatch(spark, nulled, batch, out)
    }
    assert(e3.getMessage.contains(
      s"sig_v != ${MediaPipeline.SignatureVersion}"), e3.getMessage)
    // the store appendBatch itself writes passes its own check
    val s = MediaPipeline.appendBatch(spark,
      MediaPipeline.emptyMediaSignatureStore(spark), batch, out)
    assert(s.accepted == 1)
    val out2 = java.nio.file.Files.createTempDirectory("media_v2").toString
    val s2 = MediaPipeline.appendBatch(spark,
      spark.read.parquet(s"$out/signatures"), batch, out2)
    assert(s2.accepted == 0) // exact dup of history, store version accepted
  }

  test("video rows dedup per modality and corrupt AVIs quarantine") {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]
    val rnd = new scala.util.Random(5)
    import MediaFixtures.{shot, encShot, randomFrame}
    val a = shot(rnd, 5)
    val aTweaked = a.map(_.map(_.clone())).clone()
    aTweaked(1) = randomFrame(rnd)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", encShot(a), "avi", 8, 8, 0),
      Multimodal.MediaRow(2L, "video", encShot(aTweaked), "avi", 8, 8, 0), // near-dup → dropped
      Multimodal.MediaRow(3L, "video", encShot(shot(rnd, 5)), "avi", 8, 8, 0), // fresh → kept
      Multimodal.MediaRow(4L, "video",
        Array.tabulate[Byte](120)(_.toByte), "avi", 8, 8, 0))              // corrupt → quarantined
    val out = java.nio.file.Files.createTempDirectory("media_vid").toString
    val s = MediaPipeline.curate(spark,
      spark.createDataset(rows)(enc), out, maxHamming = 3)
    assert(s == MediaPipeline.MediaCurationSummary(
      input = 4, decodable = 3, nearDupRemoved = 1, curated = 2), s.toString)
    assert(spark.read.parquet(s"$out/curated")
      .select($"media_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val q = spark.read.parquet(s"$out/quarantine").collect()
    assert(q.length == 1 && q.head.getLong(0) == 4L &&
      q.head.getString(2).contains("RIFF"), q.mkString(","))
    // append mode: a near-dup of a historical video is dropped
    val out1 = java.nio.file.Files.createTempDirectory("media_vap1").toString
    MediaPipeline.appendBatch(spark,
      MediaPipeline.emptyMediaSignatureStore(spark),
      spark.createDataset(rows.take(1))(enc), out1)
    val out2 = java.nio.file.Files.createTempDirectory("media_vap2").toString
    val s2 = MediaPipeline.appendBatch(spark,
      spark.read.parquet(s"$out1/signatures"),
      spark.createDataset(Seq(
        Multimodal.MediaRow(11L, "video", encShot(aTweaked), "avi", 8, 8, 0)))(enc),
      out2)
    assert(s2 == MediaPipeline.MediaAppendSummary(
      batchInput = 1, decodable = 1, newContent = 1,
      dupOfHistory = 1, accepted = 0), s2.toString)
  }

  test("MJPEG MP4 and its AVI twin dedup as one video end to end") {
    // the same three decoded frames in two different CONTAINERS must
    // land in one signature space and collapse to one curated row —
    // the cross-container property the codec-level specs pin, proven
    // here through the full curate path (validate → hash → near-dup
    // cluster → keeper selection)
    import spark.implicits._
    import graft.multimodal.{Jpeg, Mp4}
    val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]
    val (w, h) = (24, 16)
    def frame(seed: Int): Array[Byte] = {
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val v = if (((x + seed) / 8 + y / 8) % 2 == 0) 200 else 40
        rgb(o) = v.toByte; rgb(o + 1) = v.toByte; rgb(o + 2) = v.toByte
      }
      Jpeg.encodeJpeg(rgb, w, h, quality = 90)
    }
    def inverted(): Array[Byte] = {
      val rgb = Array.fill[Byte](w * h * 3)(220.toByte)
      for (y <- 0 until h; x <- 0 until w if (x / 4 + y / 4) % 2 == 0) {
        val o = (y * w + x) * 3
        rgb(o) = 10; rgb(o + 1) = 10; rgb(o + 2) = 10
      }
      Jpeg.encodeJpeg(rgb, w, h, quality = 90)
    }
    val j = Seq(frame(0), frame(8), frame(16))
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", Mp4.encodeMp4Mjpeg(w, h, j), "mp4", w, h, 0),
      Multimodal.MediaRow(2L, "video",
        Multimodal.encodeAviMjpeg(w, h, j, fps = 5), "avi", w, h, 0),
      Multimodal.MediaRow(3L, "video",
        Multimodal.encodeAviMjpeg(w, h, Seq(inverted(), inverted(), inverted()),
          fps = 5), "avi", w, h, 0))
    val out = java.nio.file.Files.createTempDirectory("media_mjpeg").toString
    val s = MediaPipeline.curate(spark, spark.createDataset(rows)(enc), out)
    assert(s == MediaPipeline.MediaCurationSummary(
      input = 3, decodable = 3, nearDupRemoved = 1, curated = 2), s.toString)
    // keeper is the min media_id of the {mp4, avi} twin cluster
    assert(spark.read.parquet(s"$out/curated")
      .select($"media_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("PNG rows validate, quarantine, and near-dup across containers") {
    import spark.implicits._
    val base: (Int, Int) => (Int, Int, Int) =
      (x, _) => if (x < 8) (0, 0, 0) else (255, 255, 255)
    val tweak: (Int, Int) => (Int, Int, Int) =
      (x, y) => if ((x, y) == (1, 1)) (40, 40, 40) else base(x, y)
    val goodPng = Multimodal.encodePng(16, 16, base)
    val corrupt = goodPng.clone()
    corrupt(goodPng.length - 15) = (corrupt(goodPng.length - 15) ^ 0x40).toByte
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", goodPng, "png", 16, 16, 0),
      // same pixels in a BMP container → near-dup ACROSS containers
      Multimodal.MediaRow(2L, "image", Multimodal.encodeBmp24(16, 16, base),
        "bmp", 16, 16, 0),
      // tweaked PNG → near-dup within the container
      Multimodal.MediaRow(3L, "image", Multimodal.encodePng(16, 16, tweak),
        "png", 16, 16, 0),
      // flipped payload byte → quarantined with the CRC error, not crashed
      Multimodal.MediaRow(4L, "image", corrupt, "png", 16, 16, 0))
    val out = java.nio.file.Files.createTempDirectory("media_png").toString + "/out"
    val s = MediaPipeline.curate(spark, spark.createDataset(rows), out)
    assert(s == MediaPipeline.MediaCurationSummary(
      input = 4, decodable = 3, nearDupRemoved = 2, curated = 1), s.toString)
    assert(spark.read.parquet(s"$out/curated")
      .select($"media_id").as[Long].collect().toSeq == Seq(1L))
    val q = spark.read.parquet(s"$out/quarantine").collect()
    assert(q.length == 1 && q.head.getLong(0) == 4L &&
      q.head.getString(2).contains("CRC"), q.mkString(","))
  }

  test("curate guards only its write targets, not the whole output root") {
    val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]
    val rows = Seq(Multimodal.MediaRow(1L, "image",
      bmp((x, _) => if (x < 8) (0, 0, 0) else (255, 255, 255)),
      "bmp", 16, 16, 0))
    val out = java.nio.file.Files.createTempDirectory("media_root").toString
    // keeping the raw input under the same root, BESIDE curated/ and
    // quarantine/, is a legal layout the guard must not reject
    spark.createDataset(rows)(enc).write.parquet(s"$out/raw")
    val raw = spark.read.parquet(s"$out/raw").as[Multimodal.MediaRow](enc)
    val s = MediaPipeline.curate(spark, raw, out)
    assert(s.curated == 1)
    // input under an actual write target still fails fast
    val clash = spark.read.parquet(s"$out/curated").as[Multimodal.MediaRow](enc)
    val e = intercept[IllegalArgumentException] {
      MediaPipeline.curate(spark, clash, out)
    }
    assert(e.getMessage.contains("curated"), e.getMessage)
  }
}
