package graft

import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private val long1 = ("the quick brown fox jumps over the lazy dog again and " +
    "again today with more useful words attached to make the quality score pass")
  private val long1Near = long1.replace("today", "tonight")
  private val long2 = ("completely different content about query engines big " +
    "shuffles broadcast joins and vectorized scans in a modern analytics stack")

  private def docs = Seq(
    (1L, long1),
    (2L, long1),        // exact dup of 1 → dropped at stage 3
    (3L, long1Near),    // near-dup of 1 → dropped at stage 4
    (4L, long2),
    (5L, "!!! ;;; ??? 123 456 ,,, ...") // no alpha, heavy punct: gated at stage 2
  ).toDF("doc_id", "text")

  test("curate drops low-quality, exact dups and near-dup cluster members") {
    val out = java.nio.file.Files.createTempDirectory("corpus").toString
    val s = CorpusPipeline.curate(spark, docs, out, minQuality = 0.2)
    assert(s.input == 5)
    assert(s.afterQuality == 4)       // doc 5 gated
    assert(s.afterExactDedup == 3)    // doc 2 deduped (keeper 1)
    assert(s.curated == 2)            // doc 3 clustered with 1, keeper 1 stays
    assert(s.nearDupMembersRemoved == 1)
    val kept = spark.read.parquet(s"$out/corpus")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
    val stats = spark.read.parquet(s"$out/lang_stats")
    assert(stats.count() >= 1)
    assert(stats.columns.toSeq == Seq("lang_pred", "docs", "avg_quality", "avg_chars"))
  }

  test("curate is idempotent: curating a curated corpus removes nothing") {
    val out1 = java.nio.file.Files.createTempDirectory("corpus1").toString
    CorpusPipeline.curate(spark, docs, out1, minQuality = 0.2)
    val curated = spark.read.parquet(s"$out1/corpus").select($"doc_id", $"text")
    val out2 = java.nio.file.Files.createTempDirectory("corpus2").toString
    val s2 = CorpusPipeline.curate(spark, curated, out2, minQuality = 0.2)
    assert(s2.input == s2.curated)
  }

  test("curate runs over the judged documents table") {
    val out = java.nio.file.Files.createTempDirectory("corpusd").toString
    val s = CorpusPipeline.curate(spark, Tables.documents(spark, sf()), out)
    assert(s.curated > 0 && s.curated <= s.input)
  }
}
