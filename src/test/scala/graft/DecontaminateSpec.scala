package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSpecBase {
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "vectorized execution engines batch tuples into columns")
  ).toDF("doc_id", "text")

  test("an exact benchmark copy has containment 1.0") {
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val got = Decontaminate.maxContainment(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0)
  }

  test("a benchmark quote inside a longer doc is highly contained; fresh text is not flagged") {
    val corpus = Seq(
      (1L, "prefix words then the quick brown fox jumps over the lazy dog and suffix"),
      (2L, "completely unrelated material about streaming watermarks and state")
    ).toDF("doc_id", "text")
    val cont = Decontaminate.maxContainment(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cont(1L) > 0.5 && cont(1L) < 1.0)
    assert(cont.get(2L).forall(_ < 0.5))
    val flagged = Decontaminate.contaminated(corpus, bench, "doc_id", "text",
        minContainment = 0.6)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L))
  }

  test("containment is asymmetric: a doc containing the benchmark is not itself contained") {
    // corpus doc = benchmark + lots of extra text: doc's shingles are NOT
    // mostly inside the benchmark once the doc is much longer
    val long = "the quick brown fox jumps over the lazy dog " +
      Seq.fill(20)("plus many additional novel filler words appended here").mkString(" ")
    val corpus = Seq((1L, long)).toDF("doc_id", "text")
    val cont = Decontaminate.maxContainment(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cont(1L) < 0.5)
  }

  test("judged query matches the exact list-intersect formulation on testdata") {
    val docs = Tables.documents(spark, sf()).filter($"doc_id" < 200)
    val corpus = docs.filter(pmod($"doc_id", lit(10)) =!= 0)
    val bch = docs.filter(pmod($"doc_id", lit(10)) === 0)
    // exact reference: all-pairs list intersect over the bounded window
    val sh = Decontaminate.shingleSet("text", 3)
    val c = corpus.select($"doc_id", sh.as("sa"))
    val b = bch.select($"doc_id".as("b_id"), sh.as("sb"))
    val want = c.crossJoin(b)
      .select($"doc_id",
        (size(array_intersect($"sa", $"sb")).cast("double") / size($"sa")).as("x"))
      .groupBy($"doc_id").agg(round(max($"x"), 6).as("cont"))
      .filter($"cont" >= 0.8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = graft.operators.TrainingData.textDecontaminate(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }
}
