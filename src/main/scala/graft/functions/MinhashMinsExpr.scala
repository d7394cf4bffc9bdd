package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: ALL k universal-hash minima of a hashed
  * shingle set in ONE array pass — `[min_h (h·a_i + b_i) mod p | i <
  * k]` for an `array<bigint>` input.
  *
  * The composed form `array_min(transform(hs, …))` × k evaluates the
  * input k times and allocates k intermediate arrays per ROW; for
  * MinHash banding over a corpus (16 hashes × every document, the
  * dominant cost of `dedup_minhash_lsh`'s candidate generation) the
  * allocation dominates. This expression keeps k running minima in a
  * primitive register array and reads the input once — same arithmetic
  * bit for bit (ScalableDedupSpec asserts signature equality against
  * the composed form), so the pinned-hash oracle contract is untouched.
  *
  * An input with NO non-null elements — empty, or every slot null —
  * yields NULL (for empty input this matches `array_min` over an empty
  * transform); callers that must avoid the all-null-band collapse
  * filter `size > 0` first, as [[graft.operators.ScalableDedup
  * .minhashBandSignatures]] does. Null ELEMENTS are skipped like the
  * composed form skips them; a saw-non-null flag turns the degenerate
  * all-null case into NULL rather than Long.MaxValue minima, so no
  * garbage sentinel can ever escape into a signature. */
case class MinhashMinsExpr(child: Expression, as: Seq[Long], bs: Seq[Long],
    p: Long) extends UnaryExpression {

  require(as.nonEmpty && as.length == bs.length,
    s"coefficient lists must be non-empty and equal-length (${as.length}, ${bs.length})")
  require(p > 0, s"modulus must be positive, got $p")

  private val k = as.length
  // hoisted once — nullSafeEval runs per ROW in interpreted contexts,
  // and a per-row Seq→Array copy is exactly the allocation class this
  // expression exists to remove
  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_mins"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    var sawValue = false
    while (i < n) {
      // null slots are SKIPPED, exactly as the composed form does
      // (transform propagates the null, array_min ignores it) — reading
      // them as 0 would inject b_j % p as a spurious minimum. Hash
      // arrays are null-free in practice; the branch is for type
      // parity with composed-form inputs (containsNull=true schemas).
      if (!arr.isNullAt(i)) {
        sawValue = true
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val m = (h * aArr(j) + bArr(j)) % p
          if (m < mins(j)) mins(j) = m
          j += 1
        }
      }
      i += 1
    }
    if (!sawValue) null else new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aRef = ctx.addReferenceObj("minhashA", as.toArray, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bs.toArray, "long[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val m = ctx.freshName("m"); val mins = ctx.freshName("mins")
      val saw = ctx.freshName("saw")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  boolean $saw = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { continue; }
         |    $saw = true;
         |    final long $h = $a.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $m = ($h * $aRef[$j] + $bRef[$j]) % ${p}L;
         |      if ($m < $mins[$j]) { $mins[$j] = $m; }
         |    }
         |  }
         |  if (!$saw) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashMinsExpr {
  /** Column API: all k pinned minhash minima in one pass. Inputs are the
    * universal-hash coefficient lists and modulus — callers pass the
    * SAME pinned constants their oracle replays. */
  def minhash_mins(hashes: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    GraftBridge.column(MinhashMinsExpr(GraftBridge.expression(hashes), as, bs, p))
}
