package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the SORTED DISTINCT 32-bit md5-prefix
  * hashes of a text's character n-gram shingles, in one fused pass —
  * semantically `array_sort(array_distinct(transform(shingleSet(text,
  * n), s -> ('0x'||substr(md5(s),1,8))::BIGINT)))`, the
  * `dedup_minhash_lsh` shingling recipe.
  *
  * The composed chain materializes the shingle STRING array, then per
  * shingle a 32-char hex string, a substring, and a base-16 parse —
  * for ~800 shingles × every document that string churn dominates the
  * hashing stage. Here each n-gram goes UTF8String → md5 digest →
  * first 4 bytes as an unsigned 32-bit value directly (identical to
  * parsing the first 8 hex chars — md5's hex form IS the big-endian
  * byte string), with one reused MessageDigest per operator. Distinct
  * + sort run on a primitive long[] in place.
  *
  * Position semantics replicate `shingleSet` exactly: 1-based SQL
  * substring over CHARACTERS, max(len − n + 1, 1) positions, so text
  * shorter than n (including empty) yields its single whole-text
  * shingle — never an empty array. Hash-then-distinct equals
  * distinct-then-hash (equal strings hash equally; 32-bit collisions
  * merge identically in both orders). ScalableDedupSpec pins equality
  * against the composed chain on the real corpus. */
case class ShingleHash32Expr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"shingle length must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash32"

  // one digest per operator on the interpreted path too (nullSafeEval
  // runs per ROW) — matches the codegen path's mutable-state reuse
  @transient private lazy val interpretedMd =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val t = v.asInstanceOf[UTF8String]
    new GenericArrayData(ShingleHash32Expr.hashes(t, n, interpretedMd))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "shingleMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHash32Expr.hashes($t, $n, $md));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash32Expr {
  /** The fused kernel: sorted distinct 32-bit md5-prefix hashes of the
    * char n-grams of `t`. Shared by interpreted eval and codegen. */
  def hashes(t: UTF8String, n: Int, md: java.security.MessageDigest): Array[Long] = {
    val len = t.numChars()
    val count = math.max(len - (n - 1), 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      // 1-based SQL substring over characters — shingleSet's exact recipe
      val s = t.substringSQL(i + 1, n)
      md.reset()
      md.update(s.getBytes)
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place unique compaction on the sorted array
    var w = 0
    var r = 1
    while (r < count) {
      if (out(r) != out(w)) { w += 1; out(w) = out(r) }
      r += 1
    }
    if (w + 1 == count) out else java.util.Arrays.copyOf(out, w + 1)
  }

  /** Column API: `shingle_hash32(text, n)` — the one-expression form of
    * `ScalableDedup.shingleHashes(Decontaminate.shingleSet(text, n))`. */
  def shingle_hash32(text: Column, n: Int): Column =
    GraftBridge.column(ShingleHash32Expr(GraftBridge.expression(text), n))
}
