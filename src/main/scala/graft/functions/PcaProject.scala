package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Centered PCA projection, quantized: element k of the result is
  * Σ_d round((x_d − μ_d) · P[k][d] · 1e12) :: long — the mean-centered
  * dot product with principal component k under the repo's exact-integer
  * cross-engine arithmetic (per-term rounding, associative long
  * summation, so the value is partitioning-invariant and the DuckDB
  * oracle replays it from the same (μ, P) literals).
  *
  * The mean vector and component matrix ride along as reference objects
  * (the [[IvfCellE12]] pattern), so the generated code is one tight
  * k×d double loop inside whole-stage codegen — no per-element lambda
  * dispatch. Null if the vector's dimensionality does not match μ/P, or
  * any element is null. */
case class PcaProjectE12(child: Expression, mean: Array[Double],
                         comps: Array[Array[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pca_project_e12 expects array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pca_project_e12"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = mean.length
    if (a.numElements() != dim) null
    else if ((0 until dim).exists(a.isNullAt)) null
    else {
      val out = new Array[Long](comps.length)
      var k = 0
      while (k < comps.length) {
        val p = comps(k)
        var acc = 0L
        var d = 0
        while (d < dim) {
          acc += QuantKernels.qround(
            (a.getFloat(d).toDouble - mean(d)) * p(d) * 1e12)
          d += 1
        }
        out(k) = acc
        k += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mu = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val mat = ctx.addReferenceObj("pcaComps", comps, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      val hasNull = ctx.freshName("hasNull")
      val dim = mean.length
      val nk = comps.length
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $hasNull = false;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    if ($a.isNullAt($d)) { $hasNull = true; break; }
         |  }
         |  if ($hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long[] $out = new long[$nk];
         |    for (int $k = 0; $k < $nk; $k++) {
         |      long $acc = 0L;
         |      for (int $d = 0; $d < $dim; $d++) {
         |        final double $p = (((double) $a.getFloat($d)) - $mu[$d]) * $mat[$k][$d] * 1e12;
         |        $acc += ${QuantKernels.qroundJava(p)};
         |      }
         |      $out[$k] = $acc;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PcaProjectE12 =
    copy(child = newChild)
}
