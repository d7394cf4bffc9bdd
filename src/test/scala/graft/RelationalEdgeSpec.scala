package graft

import org.apache.spark.sql.functions._

/** Null/edge semantics for aggregates, joins and set ops on hand-built
  * fixtures (SURVEY.md §5.2). */
class RelationalEdgeSpec extends SparkSpecBase {
  import spark.implicits._

  test("stddev_samp of a single row is null") {
    val r = Seq(("a", 1.0)).toDF("k", "v")
      .groupBy($"k").agg(stddev_samp($"v").as("sd")).collect().head
    assert(r.isNullAt(1))
  }

  test("count(col) skips outer-join nulls, count(*) does not") {
    val left = Seq(1, 2).toDF("id")
    val right = Seq(1).toDF("rid")
    val j = left.join(right, $"id" === $"rid", "left_outer")
    val r = j.agg(count($"rid").as("c_col"), count(lit(1)).as("c_star")).collect().head
    assert(r.getLong(0) == 1 && r.getLong(1) == 2)
  }

  test("left semi returns each matching left row once; anti is its complement") {
    val left = Seq(1, 2, 3).toDF("id")
    val right = Seq(2, 2, 3).toDF("rid") // duplicate match must not multiply
    val semi = left.join(right, $"id" === $"rid", "left_semi").collect().map(_.getInt(0)).sorted
    val anti = left.join(right, $"id" === $"rid", "left_anti").collect().map(_.getInt(0))
    assert(semi.toSeq == Seq(2, 3))
    assert(anti.toSeq == Seq(1))
  }

  test("intersect and except use distinct set semantics") {
    val a = Seq(1, 1, 2, 3).toDF("v")
    val b = Seq(1, 2, 2).toDF("v")
    assert(a.intersect(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    assert(a.except(b).collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  test("full outer join preserves orphans on BOTH sides") {
    val left = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val right = Seq((2, "x"), (3, "y")).toDF("rk", "rv")
    val got = left.join(right, $"k" === $"rk", "full_outer")
      .select(coalesce($"k", $"rk").as("k"), $"lv", $"rv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1, "a", null), (2, "b", "x"), (3, null, "y")))
  }

  test("intersectAll/exceptAll keep multiset multiplicities") {
    val a = Seq(1, 1, 1, 2, 3).toDF("v")
    val b = Seq(1, 1, 2, 2).toDF("v")
    // min(3,2)=2 ones, min(1,2)=1 two, 3 absent from b
    assert(a.intersectAll(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 1, 2))
    // 3-2=1 one, 1-2→0 twos, 3 survives
    assert(a.exceptAll(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }

  test("unpivot is the inverse reshape of pivot") {
    val wide = Seq(("g1", 1.0, 10.0), ("g2", 2.0, 20.0)).toDF("g", "qty", "price")
    val long = wide.unpivot(Array($"g"), Array($"qty", $"price"), "metric", "val")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(long == Set(("g1", "qty", 1.0), ("g1", "price", 10.0),
      ("g2", "qty", 2.0), ("g2", "price", 20.0)))
  }

  test("rollup emits per-group, subtotal and grand-total rows") {
    val df = Seq(("x", "p", 1), ("x", "q", 2), ("y", "p", 4)).toDF("a", "b", "v")
    val got = df.rollup($"a", $"b").agg(sum($"v").as("s"))
      .select(coalesce($"a", lit("ALL")), coalesce($"b", lit("ALL")), $"s")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("x", "p", 1L), ("x", "q", 2L), ("y", "p", 4L),
      ("x", "ALL", 3L), ("y", "ALL", 4L), ("ALL", "ALL", 7L)))
  }

  test("max_by picks the value at the maximum ordering key (as-of semantics)") {
    val df = Seq((1L, 10L, 5L), (1L, 11L, 9L), (2L, 20L, 1L)).toDF("k", "id", "t")
    val got = df.groupBy($"k").agg(max_by($"id", $"t").as("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 11L, 2L -> 20L))
  }

  test("EXISTS+HAVING: the urgent-order total gates per customer, summed not per-order") {
    // cust 1: two urgent orders summing over the 300k bar (neither alone
    // crosses it — proves the HAVING aggregates before the semi join);
    // cust 2: one urgent order under the bar; cust 3: over the bar but
    // not urgent
    val dir = java.nio.file.Files.createTempDirectory("exh").toString
    Seq((1L, "AUTOMOBILE"), (2L, "BUILDING"), (3L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment").write.parquet(dir + "/customer.parquet")
    Seq((1L, "1-URGENT", 200000.0), (1L, "1-URGENT", 150000.0),
      (2L, "1-URGENT", 250000.0), (3L, "5-LOW", 400000.0))
      .toDF("o_custkey", "o_orderpriority", "o_totalprice")
      .write.parquet(dir + "/orders.parquet")
    val got = graft.operators.Relational.subqExistsHaving(spark, dir)
      .collect().map(_.getLong(0))
    assert(got.sameElements(Array(1L)))
  }

  test("schema evolution: gen-1 rows surface the added column as null, none lost") {
    val got = graft.operators.Relational.sourceSchemaEvolution(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.orders(spark, sf())
    // the MISSING group is exactly the even-key generation; the named
    // groups re-aggregate the odd-key generation — nothing lost or
    // duplicated across the two-footer merge
    assert(got("MISSING") == o.filter($"o_orderkey" % 2 === 0).count())
    assert(got.filterKeys(_ != "MISSING").values.sum ==
      o.filter($"o_orderkey" % 2 === 1).count())
  }

  test("decimal precision widening: sums widen, DECIMAL(38) ops lose scale") {
    // sum(DECIMAL(12,2)) widens by +10 precision, same scale — room for
    // ~10^10 rows before overflow, the contract agg_decimal_money's
    // explicit output casts rely on
    val d = Seq("1.10", "2.25").map(new java.math.BigDecimal(_)).toDF("v")
      .select($"v".cast("decimal(12,2)").as("v"))
    val sumT = d.agg(sum($"v").as("s")).schema("s").dataType
    assert(sumT.sql == "DECIMAL(22,2)", sumT.sql)
    // at the DECIMAL(38) ceiling Spark's allowPrecisionLoss default
    // KEEPS precision 38 and sacrifices scale to 6 instead of erroring
    // (DuckDB errors on the same multiply — why the judged queries pin
    // values via explicit casts well below the ceiling)
    val wide = d.select($"v".cast("decimal(38,10)").as("w"))
      .select(($"w" * $"w").as("sq"))
    assert(wide.schema("sq").dataType.sql == "DECIMAL(38,6)",
      wide.schema("sq").dataType.sql)
    val sq = wide.orderBy($"sq").collect().map(_.getDecimal(0).toPlainString)
    assert(sq.toSeq == Seq("1.210000", "5.062500"))
    // overflow past even the loss-allowed result FAILS LOUDLY under
    // ANSI mode (Spark 4's default, judged sessions included) — money
    // math never silently wraps or nulls
    val e = intercept[Exception] {
      Seq("9" * 28).toDF("v")
        .select($"v".cast("decimal(38,0)").as("w"))
        .select(($"w" * $"w").as("sq")).collect()
    }
    assert(e.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE"), e.getMessage)
  }

  test("scd2Apply: update, re-update, and a no-op delta keep history exact") {
    import graft.operators.Relational.{scd2Init, scd2Apply}
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "attr")
    val v1 = scd2Init(base, 1L)
    // update key 1, re-update key 1, then a delta touching NO existing key
    val v2 = scd2Apply(v1, Seq((1L, "a2")).toDF("k", "attr"), "k", 2L)
    val v3 = scd2Apply(v2, Seq((1L, "a3")).toDF("k", "attr"), "k", 3L)
    val v4 = scd2Apply(v3, Seq((9L, "new")).toDF("k", "attr"), "k", 4L)
    val got = v4.orderBy($"k", $"effective_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "a", 1L, 2L, false),
      (1L, "a2", 2L, 3L, false),
      (1L, "a3", 3L, -1L, true),
      (2L, "b", 1L, -1L, true),
      (9L, "new", 4L, -1L, true)))
    // exactly one current row per key, ranges chain without gaps
    val cur = v4.filter($"is_current").groupBy($"k").count().collect()
    assert(cur.forall(_.getLong(1) == 1L))
    // out-of-order batch application fails loudly instead of writing an
    // inverted effective range (versions must increase)
    val e = intercept[Exception] {
      scd2Apply(v3, Seq((1L, "stale")).toDF("k", "attr"), "k", 2L).collect()
    }
    assert((Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse(""))
      .contains("increasing version order"))
  }

  test("scd2Apply checkUnique: a duplicate delta key fails loudly instead of double-opening") {
    import graft.operators.Relational.{scd2Init, scd2Apply}
    val v1 = scd2Init(Seq((1L, "a")).toDF("k", "attr"), 1L)
    val dupDelta = Seq((1L, "x"), (1L, "y")).toDF("k", "attr")
    // guard ON: the duplicate key raises before any row is written
    val e = intercept[Exception] {
      scd2Apply(v1, dupDelta, "k", 2L, checkUnique = true).collect()
    }
    assert((Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse(""))
      .contains("duplicate delta key"))
    // guard OFF (the documented precondition-holds fast path): the same
    // delta silently writes TWO open rows for key 1 — exactly the
    // corruption the opt-in guard exists to catch
    val corrupted = scd2Apply(v1, dupDelta, "k", 2L)
      .filter($"k" === 1L && $"is_current").count()
    assert(corrupted == 2L)
    // and a unique delta passes through the guard unchanged
    val clean = scd2Apply(v1, Seq((1L, "z")).toDF("k", "attr"), "k", 2L,
      checkUnique = true)
    assert(clean.filter($"is_current").count() == 1L)
  }

  test("decimal division at the (38,6) allowPrecisionLoss boundary keeps scale 6") {
    // DECIMAL(38,6) / DECIMAL(10,0): the raw SQL-Server rule gives
    // scale max(6, 6+10+1) = 17, precision 38-6+0+17 = 49 > 38 — Spark's
    // allowPrecisionLoss (default true) trims back to DECIMAL(38,6),
    // the boundary fn_decimal_div's scale-pinning relies on. The value
    // check uses an exactly-dividing-by-3 operand so no rounding is
    // involved: the quotient must come back digit-exact at scale 6.
    val big = new java.math.BigDecimal("12345678901234567890123456789012.345678")
    val df = spark.range(1).select(
      (lit(big).cast("decimal(38,6)") /
        lit(new java.math.BigDecimal("3")).cast("decimal(10,0)")).as("q"))
    assert(df.schema("q").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 6),
      s"unexpected quotient type ${df.schema("q").dataType}")
    assert(df.head.getDecimal(0).toPlainString ==
      "4115226300411522630041152263004.115226")
  }
}
