package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 30).repartition(4)

  test("decodeFeatures keeps ids, emits fixed-dim vectors, is deterministic") {
    val f1 = Multimodal.decodeFeatures(media, dim = 16)
    assert(f1.count() == 30)
    assert(f1.collect().forall(_.features.length == 16))
    val again = Multimodal.decodeFeatures(media, dim = 16)
      .collect().map(r => r.media_id -> r.features.toSeq).toMap
    val first = f1.collect().map(r => r.media_id -> r.features.toSeq).toMap
    assert(again == first)
  }

  test("decode is a pure map: partitioning survives") {
    val out = Multimodal.decodeFeatures(media, dim = 4)
    assert(out.rdd.getNumPartitions == media.rdd.getNumPartitions)
  }

  test("frame sampling slices the payload with size and stride") {
    val df = Seq((1L, Array.range(0, 100).map(_.toByte))).toDF("id", "media")
    val frames = df.select(Multimodal.frameSample($"media", frameSize = 40, stride = 30).as("f"))
      .select(size($"f").as("n"), $"f").collect().head
    assert(frames.getInt(0) == 3) // offsets 0, 30, 60 fit a 40-byte frame
    val arr = frames.getSeq[Array[Byte]](1)
    assert(arr.forall(_.length == 40))
    assert(arr(1)(0) == 30.toByte)
  }

  test("resize metadata preserves aspect ratio cap") {
    val df = Seq((1024, 512), (100, 50)).toDF("width", "height")
    val got = Multimodal.resizeMeta(df, maxSide = 256)
      .select($"out_width", $"out_height").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == Seq((256, 128), (100, 50)))
  }
}
