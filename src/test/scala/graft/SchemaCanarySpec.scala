package graft

import org.apache.spark.sql.types._

/** Schema-drift canary (VERDICT r7 #6): the 2026-08-13 testdata regen
  * silently switched `events.ts` from timestamp[ns] to timestamp[us] and
  * 47 tests + 27 judged queries failed in a cascade with no single test
  * naming the cause. This suite pins the expected schema of every judged
  * table and fails with an explicit field-by-field diff when the files
  * drift — one named failure instead of a cascade.
  *
  * Timestamp columns get an allowance set, because the physical encoding
  * has already drifted once and the loaders are deliberately tolerant
  * (Tables.events branches on the resolved type): any of
  * TimestampType / TimestampNTZType / LongType(legacy nanos) is accepted
  * raw, but the *loader output* must always be session-tz TimestampType
  * for events.ts — that is the contract every operator compiles against.
  */
class SchemaCanarySpec extends SparkSpecBase {

  private val tsAllowed: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  /** expected (name, exact type or null for "timestamp-allowance") per table */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> null, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> null),
    "events" -> Seq("event_id" -> LongType, "ts" -> null,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  private def diff(table: String, actual: StructType,
      want: Seq[(String, DataType)]): Seq[String] = {
    val got = actual.fields.map(f => f.name -> f.dataType).toSeq
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    if (got.map(_._1) != want.map(_._1))
      lines += s"$table: field names drifted\n  expected ${want.map(_._1).mkString(", ")}\n  actual   ${got.map(_._1).mkString(", ")}"
    else want.zip(got).foreach { case ((n, w), (_, g)) =>
      if (w == null) {
        if (!tsAllowed.contains(g))
          lines += s"$table.$n: timestamp column resolved as $g, outside the tolerated set $tsAllowed"
      } else if (w != g)
        lines += s"$table.$n: expected $w, actual $g"
    }
    lines.toSeq
  }

  test("every judged table matches the FIXTURES.md schema (raw read)") {
    val problems = expected.toSeq.sortBy(_._1).flatMap { case (t, want) =>
      diff(t, spark.read.parquet(s"${sf()}/$t.parquet").schema, want)
    }
    assert(problems.isEmpty,
      "\nSCHEMA DRIFT DETECTED — the driver regenerated testdata with new " +
        "types. Update Tables loaders + FIXTURES.md/TESTDATA.md:\n" +
        problems.mkString("\n"))
  }

  test("loader normalizes events.ts to session-tz TimestampType at every sf") {
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val t = Tables.events(spark, sf(d)).schema("ts").dataType
      assert(t == TimestampType, s"$d: loader produced $t")
    }
  }

  test("loader ts values equal the naive file values under the UTC session") {
    // first event of sf0.001, independently known from the file footer
    // statistics: min ts = 2024-01-01 00:00:0x — assert the loaded min
    // falls inside 2024-01-01, which breaks if a tz shift sneaks in.
    val min = Tables.events(spark, sf()).agg(
      org.apache.spark.sql.functions.min("ts")).collect().head.getTimestamp(0)
    assert(min.toInstant.toString.startsWith("2024-01-01T"),
      s"min ts $min shifted out of 2024-01-01 — tz handling drifted")
  }
}
