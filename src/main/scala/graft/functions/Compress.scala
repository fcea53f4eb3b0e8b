package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE kernel for the compression-ratio quality signal: highly
  * repetitive machine-generated text compresses far better than natural
  * prose, so `deflate_bytes / raw_bytes` is a cheap single-pass
  * repetitiveness proxy used by corpus-curation toolkits alongside the
  * Gopher/C4 heuristics.
  *
  * One `Deflater` per executor thread (ThreadLocal, reset between rows)
  * — the native zlib stream allocation would otherwise dominate the
  * per-row cost. Fixed parameters (level 6, raw/nowrap) so the length
  * is a stable function of the input bytes for a given zlib build; the
  * signal consumer thresholds ratios, it never compares archives. */
object CompressKernels {
  private val LEVEL = 6

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(LEVEL, true)
  }

  /** Deflated byte length of the UTF-8 bytes of `s`. */
  def deflatedLen(s: UTF8String): Int = {
    val in = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** `deflate_len(text)` :: int — byte length of the DEFLATE stream of the
  * input's UTF-8 bytes. Codegen'd call into the shared kernel (no UDF,
  * stays inside whole-stage codegen); null propagates. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects string, got $other")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    CompressKernels.deflatedLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CompressKernels.deflatedLen($s)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
