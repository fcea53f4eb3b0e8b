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

/** Single-pass kernel behind the dedup-normalization transform
  * (`TextQueries.normalizeText`): lowercase → strip everything outside
  * `[a-z0-9 ]` → collapse space runs → trim, in ONE byte loop over the
  * lowered UTF-8 bytes instead of two Java-regex passes (the regex
  * chain measured 42.7 s over 2M docs; this loop is allocation +
  * byte-compare only). Dropping non-matching BYTES equals dropping
  * non-matching code points: every byte of a multi-byte UTF-8 sequence
  * has the high bit set, so the whole character goes. Lowercasing uses
  * the same `UTF8String.toLowerCase` as Spark's `lower`, so exotic
  * mappings (e.g. U+0130 → i + combining dot) agree with the regex
  * twin bit for bit — parity is spec-pinned on exactly such inputs. */
object NormalizeKernels {
  def normalize(s: UTF8String): UTF8String = {
    val b = s.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        out(n) = c; n += 1
        pendingSpace = false
      } else if (c == ' ') pendingSpace = true
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }
}

/** `normalize_dedup(text)` :: string — the codegen'd one-pass form of
  * the CCNet/Dolma pre-hash normalization; null propagates. */
case class NormalizeDedup(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_dedup expects string, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "normalize_dedup"

  override def nullSafeEval(input: Any): Any =
    NormalizeKernels.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NormalizeKernels.normalize($s)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeDedup =
    copy(child = newChild)
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
