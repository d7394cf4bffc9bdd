package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the two PQ hot loops (the
  * [[CosineSimilarityExpr]] precedent applied to product quantization):
  *
  *  - [[PqEncodeExpr]]: L2-normalize → per-subspace argmin over the
  *    codebook, in ONE fused register loop per row. This is the ingest
  *    path — at 100 TB it runs over every corpus vector, so it must be
  *    a tight codegen'd loop, not an interpreted higher-order-function
  *    tree. (The HOF formulation is kept as `Pq.encodeHof` for
  *    cross-validation: its nested lambdas re-evaluate the normalize
  *    per candidate distance — measured 86 ms/row interpreted, the
  *    round-14 bench regression — where this expression is ~1 µs/row.)
  *  - [[PqAdcExpr]]: asymmetric (probe-exact, corpus-quantized) squared
  *    L2 between a normalized probe and a code row — the serving-scan
  *    inner product, evaluated once per (probe, candidate).
  *
  * Arithmetic is operand-identical to the HOF forms (same left-to-right
  * accumulation, same strict-< argmin keeping the FIRST minimum, same
  * zero-norm passthrough), so swapping them under the oracle changes no
  * result bit — PqSpec pins expr == HOF on real vectors.
  *
  * The codebook rides as an expression FIELD (serialized with the plan,
  * surfaced in generated code via `addReferenceObj`), not as a nested
  * array literal the interpreter walks per element.
  */
case class PqEncodeExpr(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  private def m = books.length
  private def k = books(0).length
  private def sub = books(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = m * sub
    if (a.numElements() != dim) return null
    val buf = new Array[Double](dim)
    var nsq = 0.0
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      buf(i) = x; nsq += x * x
      i += 1
    }
    val nrm = math.sqrt(nsq)
    if (nrm != 0.0) { i = 0; while (i < dim) { buf(i) /= nrm; i += 1 } }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      var best = -1; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cent = book(c)
        var d = 0.0
        var t = 0
        while (t < sub) {
          val diff = buf(j * sub + t) - cent(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { best = c; bestD = d }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    val (mV, kV, subV, dimV) = (m, k, sub, m * sub)
    nullSafeCodeGen(ctx, ev, a => {
      val buf = ctx.freshName("buf"); val nsq = ctx.freshName("nsq")
      val nrm = ctx.freshName("nrm"); val codes = ctx.freshName("codes")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val t = ctx.freshName("t")
      val x = ctx.freshName("x"); val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val cent = ctx.freshName("cent")
      s"""
         |if ($a.numElements() != $dimV) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $buf = new double[$dimV];
         |  double $nsq = 0.0;
         |  for (int $i = 0; $i < $dimV; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $a.getDouble($i);
         |    $buf[$i] = $x; $nsq += $x * $x;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $nrm = java.lang.Math.sqrt($nsq);
         |    if ($nrm != 0.0) for (int $i = 0; $i < $dimV; $i++) $buf[$i] /= $nrm;
         |    int[] $codes = new int[$mV];
         |    for (int $j = 0; $j < $mV; $j++) {
         |      int $best = -1; double $bestD = Double.MAX_VALUE;
         |      for (int $c = 0; $c < $kV; $c++) {
         |        final double[] $cent = $booksRef[$j][$c];
         |        double $d = 0.0;
         |        for (int $t = 0; $t < $subV; $t++) {
         |          final double $diff = $buf[$j * $subV + $t] - $cent[$t];
         |          $d += $diff * $diff;
         |        }
         |        if ($d < $bestD) { $best = $c; $bestD = $d; }
         |      }
         |      $codes[$j] = $best;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric distance: Σ_j ‖vp[j·sub : (j+1)·sub] − books[j][codes[j]]‖²,
  * inner sums accumulated left-to-right then added in subspace order —
  * operand-identical to the HOF `Pq.adcDistHof`. Null on length mismatch,
  * null elements, or an out-of-range code. */
case class PqAdcExpr(left: Expression, right: Expression,
    books: Array[Array[Array[Double]]]) extends BinaryExpression {
  private def m = books.length
  private def k = books(0).length
  private def sub = books(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<int>), " +
        s"got ${l.catalogString} and ${r.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val vp = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    if (vp.numElements() != m * sub || codes.numElements() != m) return null
    var total = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= k) return null
      val cent = books(j)(c)
      var d = 0.0
      var t = 0
      while (t < sub) {
        if (vp.isNullAt(j * sub + t)) return null
        val diff = vp.getDouble(j * sub + t) - cent(t)
        d += diff * diff
        t += 1
      }
      total += d
      j += 1
    }
    total
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    val (mV, kV, subV, dimV) = (m, k, sub, m * sub)
    nullSafeCodeGen(ctx, ev, (vp, codes) => {
      val j = ctx.freshName("j"); val t = ctx.freshName("t")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val diff = ctx.freshName("diff"); val total = ctx.freshName("total")
      val cent = ctx.freshName("cent")
      s"""
         |if ($vp.numElements() != $dimV || $codes.numElements() != $mV) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $total = 0.0;
         |  for (int $j = 0; $j < $mV && !${ev.isNull}; $j++) {
         |    if ($codes.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    final int $c = $codes.getInt($j);
         |    if ($c < 0 || $c >= $kV) { ${ev.isNull} = true; break; }
         |    final double[] $cent = $booksRef[$j][$c];
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $subV; $t++) {
         |      if ($vp.isNullAt($j * $subV + $t)) { ${ev.isNull} = true; break; }
         |      final double $diff = $vp.getDouble($j * $subV + $t) - $cent[$t];
         |      $d += $diff * $diff;
         |    }
         |    $total += $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $total;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqExprs {
  /** Column entry points. `vec` for encode may be float — cast up; the
    * ADC probe must already be the normalized array<double> the caller
    * materialized (no hidden per-row recast on the scan path). */
  def pq_encode(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqEncodeExpr(
      GraftBridge.expression(VectorFunctions.toDoubleVec(vec)),
      books.map(_.map(_.toArray).toArray).toArray))

  def pq_adc(vp: Column, codes: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqAdcExpr(
      GraftBridge.expression(vp), GraftBridge.expression(codes),
      books.map(_.map(_.toArray).toArray).toArray))
}
