package graft

import graft.multimodal.Multimodal
import graft.operators.Media

/** The judged multimodal roundtrip queries (mm_image_ahash /
  * mm_audio_energy): the DuckDB oracle recomputes the integer features
  * from the key lattice, so these specs pin the other half of the
  * contract — that the engine's numbers really did travel through the
  * container codecs (decode(encode(x)) == x, bit-exact), and that the
  * query output matches an independent Scala recompute of the same
  * features. */
class MediaQueriesSpec extends SparkSpecBase {

  private def imagePixels(pk: Long): Array[Long] =
    Array.tabulate(64)(k => (pk * 37 + k * 11) % 256)

  private def audioSamples(ck: Long): Array[Long] =
    Array.tabulate(256)(k => ((ck * 31 + k * 17) % 4001) - 2000)

  test("BMP roundtrip is bit-lossless on the image lattice") {
    for (pk <- Seq(0L, 1L, 7L, 199L)) {
      val expected = imagePixels(pk)
      val bytes = Multimodal.encodeBmp24(8, 8, (x, y) => {
        val v = expected(y * 8 + x).toInt; (v, v, v)
      })
      assert(Multimodal.bmpGrayPixels(bytes).toSeq == expected.toSeq,
        s"pixel roundtrip diverged for key $pk")
    }
  }

  test("WAV roundtrip is bit-lossless on the audio lattice") {
    for (ck <- Seq(0L, 1L, 42L, 200L)) {
      val expected = audioSamples(ck)
      val bytes = Multimodal.encodeWavPcm16(
        expected.map(_.toShort), sampleRate = 8000)
      assert(Multimodal.wavSamples(bytes).toSeq == expected.toSeq,
        s"sample roundtrip diverged for key $ck")
    }
  }

  private def pngPixels(pk: Long): Array[Long] =
    Array.tabulate(64)(k => (pk * 53 + k * 29) % 256)

  private def videoPixels(sk: Long): Array[Long] =
    Array.tabulate(192)(k => (sk * 13 + k * 7) % 256)

  test("PNG roundtrip is bit-lossless through zlib + scanline filters") {
    for (pk <- Seq(0L, 1L, 7L, 199L)) {
      val expected = pngPixels(pk)
      val bytes = Multimodal.encodePng(8, 8, (x, y) => {
        val v = expected(y * 8 + x).toInt; (v, v, v)
      })
      assert(Multimodal.pngGrayPixels(bytes).toSeq == expected.toSeq,
        s"PNG pixel roundtrip diverged for key $pk")
    }
  }

  test("AVI roundtrip is bit-lossless and preserves FRAME ORDER") {
    for (sk <- Seq(0L, 1L, 42L)) {
      val expected = videoPixels(sk)
      val bytes = Multimodal.encodeAviDib(8, 8, (0 until 3).map { f =>
        (x: Int, y: Int) => {
          val v = expected(f * 64 + y * 8 + x).toInt; (v, v, v)
        }
      })
      assert(Multimodal.aviGrayPixels(bytes).toSeq == expected.toSeq,
        s"AVI pixel roundtrip diverged for key $sk")
    }
    // the frame-order witness: reversing frames changes the weighted
    // sum the judged query hashes — on keys whose first and last frame
    // SUMS differ (wsum = ΣfSf, so S0 == S2 keys are blind to a full
    // reversal; keys 0/1/7 have S0 ≠ S2 on this lattice, and a
    // frame-order slip in the container would hit EVERY key at once)
    for (sk <- Seq(0L, 1L, 7L)) {
      val px = videoPixels(sk)
      val wsum = px.zipWithIndex.map { case (v, k) => (k / 64 + 1) * v }.sum
      val reversed = (2 to 0 by -1).flatMap(f =>
        px.slice(f * 64, f * 64 + 64)).zipWithIndex
        .map { case (v, k) => (k / 64 + 1) * v }.sum
      assert(wsum != reversed,
        s"wsum must be frame-order-sensitive for key $sk")
    }
  }

  test("mm_video_frames row matches an independent feature recompute") {
    val row = Media.mmVideoFrames(spark, sf())
      .filter("s_suppkey = 3").collect().head
    val px = videoPixels(3L)
    assert(row.getLong(1) == 192L && row.getLong(2) == 3L)
    assert(row.getLong(3) == px.sum)
    assert(row.getLong(4) == px.min && row.getLong(5) == px.max)
    assert(row.getLong(6) ==
      px.zipWithIndex.map { case (v, k) => (k / 64 + 1) * v }.sum)
  }

  test("mm_image_ahash row matches an independent feature recompute") {
    val row = Media.mmImageAhash(spark, sf())
      .filter("p_partkey = 7").collect().head
    val px = imagePixels(7L)
    val s = px.sum
    val lo = (0 until 32).map(k => if (64 * px(k) > s) 1L << k else 0L).sum
    val hi = (32 until 64).map(k => if (64 * px(k) > s) 1L << (k - 32) else 0L).sum
    assert(row.getLong(1) == 64L && row.getLong(2) == s)
    assert(row.getLong(3) == px.min && row.getLong(4) == px.max)
    assert(row.getLong(5) == lo && row.getLong(6) == hi)
  }

  test("mm_audio_energy row matches an independent feature recompute") {
    val row = Media.mmAudioEnergy(spark, sf())
      .filter("c_custkey = 42").collect().head
    val smp = audioSamples(42L)
    assert(row.getLong(1) == 256L)
    assert(row.getLong(2) == smp.map(x => x * x).sum)
    assert(row.getLong(3) == smp.map(math.abs).max)
    assert(row.getLong(4) == smp.map(math.abs).sum)
    assert(row.getLong(5) == smp.head && row.getLong(6) == smp.last)
  }

  test("bmpGrayPixels refuses non-gray payloads loudly") {
    val colored = Multimodal.encodeBmp24(2, 2, (x, y) => (10 + x, 20, 30 + y))
    val e = intercept[IllegalArgumentException](
      Multimodal.bmpGrayPixels(colored))
    assert(e.getMessage.contains("non-gray"))
  }
}
