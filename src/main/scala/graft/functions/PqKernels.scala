package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Product-quantization kernels for the IVF-PQ ANN path (`sim.Pq`):
  * residual vectors are split into `m` subspaces of `dsub` dims; each
  * subspace is encoded as the index of its nearest codeword, and
  * query-to-code distances are evaluated ADC-style (asymmetric distance
  * computation: exact query residual vs quantized corpus codes).
  *
  * Same cross-engine exactness policy as the embedding kernels: every
  * per-element squared difference is quantized to an integer
  * (`round(d²·1e12) :: long`) before summation, so the DuckDB oracle —
  * evaluating the identical arithmetic from the same literal codebooks —
  * agrees bit-for-bit, ties resolved to the lowest code id. Codebooks
  * ride along as reference objects (task binaries are broadcast per
  * stage), keeping the generated code a tight scalar loop.
  */
object PqKernels {
  /** Flat view of a codebook set: cb(sub)(code)(d). */
  type Codebooks = Array[Array[Array[Double]]]
}

/** Encode a residual vector (array<double>, length m·dsub) as its `m`
  * per-subspace nearest-codeword indices (array<int>). Null on length
  * mismatch or a null element (consistent with the HOF argmin chain). */
case class PqEncodeE12(child: Expression, codebooks: PqKernels.Codebooks)
  extends UnaryExpression {

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val dsub = codebooks(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode_e12 expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_e12"

  override def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[ArrayData]
    if (r.numElements() != m * dsub) return null
    var i = 0
    while (i < m * dsub) { if (r.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = Long.MaxValue
      var bestJ = 0
      var j = 0
      while (j < k) {
        val cw = codebooks(sub)(j)
        var acc = 0L
        var d = 0
        // early abandonment: the accumulator is a monotone sum of
        // non-negative quantized terms, so once acc >= best this code
        // cannot win — and ties-to-lowest is preserved exactly (the
        // update rule is strict <, so an equal-later code never
        // displaces; abandoning at >= can only skip codes that would
        // not have updated). Nulls were pre-checked above, so no
        // check is skipped. At kcodes=256 production capacity this is
        // what keeps the full-corpus encode pass affordable — the
        // same argument as the IvfCellE12/IvfProbesE12 kernels.
        while (d < dsub && acc < best) {
          val diff = r.getDouble(sub * dsub + d) - cw(d)
          acc += QuantKernels.qround(diff * diff * 1e12)
          d += 1
        }
        if (acc < best) { best = acc; bestJ = j }
        j += 1
      }
      codes(sub) = bestJ
      sub += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, r => {
      val codes = ctx.freshName("codes")
      val hasNull = ctx.freshName("hasNull")
      val i = ctx.freshName("i")
      val sub = ctx.freshName("sub")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val p = ctx.freshName("p")
      s"""
         |if ($r.numElements() != ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $hasNull = false;
         |  for (int $i = 0; $i < ${m * dsub}; $i++) {
         |    if ($r.isNullAt($i)) { $hasNull = true; break; }
         |  }
         |  if ($hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    int[] $codes = new int[$m];
         |    for (int $sub = 0; $sub < $m; $sub++) {
         |      long $best = Long.MAX_VALUE;
         |      int $bestJ = 0;
         |      for (int $j = 0; $j < $k; $j++) {
         |        long $acc = 0L;
         |        // early abandonment (see nullSafeEval): monotone
         |        // non-negative accumulator + strict-< update keeps
         |        // ties-to-lowest exact; nulls pre-checked above
         |        for (int $d = 0; $d < $dsub && $acc < $best; $d++) {
         |          final double $diff = $r.getDouble($sub * $dsub + $d) - $cb[$sub][$j][$d];
         |          final double $p = $diff * $diff * 1e12;
         |          $acc += ${QuantKernels.qroundJava(p)};
         |        }
         |        if ($acc < $best) { $best = $acc; $bestJ = $j; }
         |      }
         |      $codes[$sub] = $bestJ;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeE12 =
    copy(child = newChild)
}

/** ADC distance: Σ_sub Σ_d round((qr[sub·dsub+d] − cb[sub][code_sub][d])²·1e12)
  * :: long, for a query residual (array<double>) against a corpus
  * vector's codes (array<int>). Null on shape mismatch, null elements,
  * or an out-of-range code. */
case class PqAdcE12(left: Expression, right: Expression, codebooks: PqKernels.Codebooks)
  extends BinaryExpression {

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val dsub = codebooks(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_e12 expects (array<double>, array<int>), got $l / $r")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_e12"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val qr = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    if (qr.numElements() != m * dsub || codes.numElements() != m) return null
    var acc = 0L
    var sub = 0
    while (sub < m) {
      if (codes.isNullAt(sub)) return null
      val code = codes.getInt(sub)
      if (code < 0 || code >= k) return null
      val cw = codebooks(sub)(code)
      var d = 0
      while (d < dsub) {
        if (qr.isNullAt(sub * dsub + d)) return null
        val diff = qr.getDouble(sub * dsub + d) - cw(d)
        acc += QuantKernels.qround(diff * diff * 1e12)
        d += 1
      }
      sub += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, (qr, codes) => {
      val acc = ctx.freshName("acc")
      val sub = ctx.freshName("sub")
      val d = ctx.freshName("d")
      val code = ctx.freshName("code")
      val diff = ctx.freshName("diff")
      val p = ctx.freshName("p")
      val bad = ctx.freshName("bad")
      s"""
         |if ($qr.numElements() != ${m * dsub} || $codes.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $sub = 0; $sub < $m && !$bad; $sub++) {
         |    if ($codes.isNullAt($sub)) { $bad = true; break; }
         |    final int $code = $codes.getInt($sub);
         |    if ($code < 0 || $code >= $k) { $bad = true; break; }
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      if ($qr.isNullAt($sub * $dsub + $d)) { $bad = true; break; }
         |      final double $diff = $qr.getDouble($sub * $dsub + $d) - $cb[$sub][$code][$d];
         |      final double $p = $diff * $diff * 1e12;
         |      $acc += ${QuantKernels.qroundJava(p)};
         |    }
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcE12 =
    copy(left = newLeft, right = newRight)
}
