package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, If, IsNull, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** Hand-built Count-Min sketch as a native `TypedImperativeAggregate` —
  * the frequency-estimation sibling of [[Hll]] (cardinality) in the
  * §2.12 sketch family.
  *
  * The 100 TB shape it serves: per-partition/per-day frequency sketches
  * persisted as binary columns, merged losslessly later (counter arrays
  * ADD, so merging per-partition sketches equals sketching the union),
  * then probed for any key's approximate count without rescanning data —
  * "how hot is key k across any subset of days". Point estimates
  * overcount only (never undercount): est(k) = min over d rows of the
  * counter at k's cell, with standard error ≤ 2N/w at confidence
  * 1−2^−d (Cormode & Muthukrishnan 2005). The direct consumer in this
  * engine is skew detection: probe candidate hot keys before choosing
  * the salted-join path ([[graft.operators.SkewJoin]]).
  *
  * Engineering shape: d=4 rows × w=1024 counters of 8 bytes = 32 KB per
  * sketch. Rows are indexed by Kirsch-Mitzenmacher double hashing
  * (h_i = h1 + i·h2) from ONE XxHash64 of the value, with h2 derived via
  * a splitmix64 finalizer — fixed seeds, so sketches are deterministic
  * and bit-identical across runs and merge orders. The update path is a
  * pure counter increment — commutative, associative, map-side
  * combinable; serialization is the little-endian counter array.
  */
object CountMin {
  val D = 4
  val W = 1024
  val Cells: Int = D * W
  val Bytes: Int = Cells * 8

  /** splitmix64 finalizer — derives the second hash for double hashing. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Cell index of hash `h` in row `i` (non-negative mod w). */
  def cell(h: Long, i: Int): Int = {
    val hi = h + i.toLong * mix(h)
    val m = (hi % W).toInt
    i * W + (if (m < 0) m + W else m)
  }

  def add(counts: Array[Long], h: Long): Unit = {
    var i = 0
    while (i < D) { counts(cell(h, i)) += 1; i += 1 }
  }

  def mergeInPlace(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Cells) { a(i) += b(i); i += 1 }
    a
  }

  /** Point estimate for hash `h`: min over the d counters. */
  def estimate(counts: Array[Long], h: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < D) {
      val c = counts(cell(h, i))
      if (c < best) best = c
      i += 1
    }
    best
  }

  def toBytes(counts: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(Bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(counts)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length == Bytes,
      s"count-min sketch must be $Bytes bytes, got ${bytes.length}")
    val out = new Array[Long](Cells)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  /** Estimate from a serialized sketch — the one call target for both
    * the interpreted and codegen'd arms of [[CmsEstimate]]. */
  def estimateBytes(bytes: Array[Byte], h: Long): Long =
    estimate(fromBytes(bytes), h)

  /** graft_cms_sketch(x) → binary counters (persist, merge later).
    * `hashed` must already be a 64-bit hash of the value. */
  case class CmsSketchAgg(hashed: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {
    override def children: Seq[Expression] = Seq(hashed)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def createAggregationBuffer(): Array[Long] = new Array[Long](Cells)
    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = hashed.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
      buf
    }
    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
      mergeInPlace(buf, other)
    override def eval(buf: Array[Long]): Any = toBytes(buf)
    override def serialize(buf: Array[Long]): Array[Byte] = toBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = fromBytes(bytes)
    override def prettyName: String = "graft_cms_sketch"
    override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(hashed = c.head)
  }

  /** graft_cms_merge(sketch) → binary union of sketches (counter add is
    * lossless, so re-aggregation over persisted sketch columns equals
    * one sketch over the union of the underlying data). */
  case class CmsMergeAgg(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def createAggregationBuffer(): Array[Long] = new Array[Long](Cells)
    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) mergeInPlace(buf, fromBytes(v.asInstanceOf[Array[Byte]]))
      buf
    }
    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
      mergeInPlace(buf, other)
    override def eval(buf: Array[Long]): Any = toBytes(buf)
    override def serialize(buf: Array[Long]): Array[Byte] = toBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = fromBytes(bytes)
    override def prettyName: String = "graft_cms_merge"
    override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  }

  /** Native scalar probe `graft_cms_estimate(sketch, value) → bigint`:
    * codegen'd like [[Hll.HllEstimate]] — null sketch or null value →
    * null, wrong sketch width fails loudly. `right` must be the same
    * seeded hash of the probe value that built the sketch (the Column /
    * SQL builders apply it). */
  case class CmsEstimate(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, LongType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires (binary sketch, hashed bigint), got " +
              s"${l.catalogString} and ${r.catalogString}")
      }
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_cms_estimate"
    override def nullSafeEval(sketch: Any, h: Any): Any =
      estimateBytes(sketch.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])
    override def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev,
        (b, h) => s"graft.functions.CountMin.estimateBytes($b, $h)")
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  }

  /** Null-safe 64-bit hash with the family's fixed seed (nulls yield a
    * null hash, which update()/estimate() then skip/propagate — same
    * rationale as [[Hll]]'s hash64). */
  private def hash64(e: Expression): Expression =
    If(IsNull(e), Literal.create(null, LongType), XxHash64(Seq(e), 42L))

  import org.apache.spark.sql.graftbridge.GraftBridge

  /** Column API. */
  def cmsSketch(c: Column): Column =
    GraftBridge.column(CmsSketchAgg(hash64(GraftBridge.expression(c))).toAggregateExpression())
  def cmsMerge(c: Column): Column =
    GraftBridge.column(CmsMergeAgg(GraftBridge.expression(c)).toAggregateExpression())
  def cmsEstimate(sketch: Column, value: Column): Column =
    GraftBridge.column(CmsEstimate(GraftBridge.expression(sketch),
      hash64(GraftBridge.expression(value))))

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> fn, "expectedNum" -> n.toString,
        "actualNum" -> args.length.toString, "docroot" -> "-"))

  /** SQL registration: graft_cms_sketch, graft_cms_merge,
    * graft_cms_estimate. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cms_sketch",
      (args: Seq[Expression]) => { arity("graft_cms_sketch", 1, args)
        CmsSketchAgg(hash64(args.head)) }, "built-in")
    reg.createOrReplaceTempFunction("graft_cms_merge",
      (args: Seq[Expression]) => { arity("graft_cms_merge", 1, args)
        CmsMergeAgg(args.head) }, "built-in")
    reg.createOrReplaceTempFunction("graft_cms_estimate",
      (args: Seq[Expression]) => { arity("graft_cms_estimate", 2, args)
        CmsEstimate(args.head, hash64(args(1))) }, "built-in")
  }
}
