package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Inverse-deformation-field lookup as a native codegen'd expression —
  * the distributed half of the reference's `tps_matrix` momentum
  * correction (`base.py:530-539`: `newX = dfield[0][int(x)][int(y)]`).
  *
  * Replaces the former pair of boxed Scala UDFs: ONE evaluation reads
  * BOTH corrected coordinates from a single flat `Array[Float]`
  * (`field[c·n² + x·n + y]`, float32 to halve the payload), returned as
  * a struct, with no Double boxing in the hot path. The field rides
  * along as a reference object in the serialized expression (task
  * binaries are broadcast per stage, so executors receive it once per
  * stage, not per task).
  *
  * Indexing truncates toward zero (`(int) x`), identical to the Scala
  * UDF's `.toInt` and the reference's `int(x)` on the non-negative
  * domain; coordinates outside the n×n grid yield null rather than an
  * out-of-bounds read (callers filter to the grid anyway).
  */
case class DfieldLookup(xCoord: Expression, yCoord: Expression,
                        field: Array[Float], n: Int)
  extends BinaryExpression {

  require(field.length == 2 * n * n,
    s"flat field must hold 2*$n*$n floats, got ${field.length}")

  override def left: Expression = xCoord
  override def right: Expression = yCoord

  override def checkInputDataTypes(): TypeCheckResult =
    if (xCoord.dataType == DoubleType && yCoord.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dfield_lookup expects (double, double), got ${xCoord.dataType} / ${yCoord.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("xm", DoubleType, nullable = false),
    StructField("ym", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "dfield_lookup"

  override def nullSafeEval(xv: Any, yv: Any): Any = {
    val xi = xv.asInstanceOf[Double].toInt
    val yi = yv.asInstanceOf[Double].toInt
    if (xi < 0 || xi >= n || yi < 0 || yi >= n) null
    else {
      val off = xi * n + yi
      new GenericInternalRow(Array[Any](
        field(off).toDouble, field(n * n + off).toDouble))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("dfieldFlat", field, "float[]")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val off = ctx.freshName("off")
      s"""
         |final int $xi = (int) $x;
         |final int $yi = (int) $y;
         |if ($xi < 0 || $xi >= $n || $yi < 0 || $yi >= $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $off = $xi * $n + $yi;
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{(double) $f[$off], (double) $f[${n * n} + $off]});
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DfieldLookup =
    copy(xCoord = newLeft, yCoord = newRight)
}
