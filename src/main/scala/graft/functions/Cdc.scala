package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) kernel — gear-hash chunking in the
  * style of Ddelta / FastCDC (Xia et al., USENIX ATC 2016 "FastCDC: a
  * Fast and Efficient Content-Defined Chunking Approach for Data
  * Deduplication"): a rolling "gear" hash `h = (h << 1) + GEAR[byte]`
  * declares a chunk boundary wherever `h & mask == 0` (expected chunk
  * size 2^maskBits bytes), clamped to [minSize, maxSize]. Because
  * boundaries depend only on local CONTENT, inserting or deleting bytes
  * re-chunks only the neighborhood of the edit — every chunk outside it
  * keeps its identity, which is exactly what fixed-width chunking
  * cannot do. Chunk identity = FNV-1a 64 over the chunk's bytes.
  *
  * This is the byte-level member of the dedup family: it needs no
  * tokenizer, so it applies to the opaque BINARY payloads of the
  * multimodal tables as well as to text (the expression accepts both) —
  * shared-chunk containment between two blobs is the storage-dedup /
  * near-identical-asset signal the token-level families can't see.
  *
  * Determinism: the gear table derives from a fixed seed via the public
  * splitmix64 mixer, so chunk boundaries and hashes are stable across
  * JVMs and sessions (no SQL oracle exists — a rolling 256-entry table
  * lookup is not expressible in DuckDB — so the CDC queries are
  * rows-only, pinned by CdcSpec like the deflate kernel).
  */
object CdcKernels {
  /** splitmix64 (Steele et al. 2014, public domain reference mixer). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 256-entry gear table from a fixed seed. */
  private val GEAR: Array[Long] = Array.tabulate(256)(i => mix(i.toLong))

  private val FNV_OFFSET = 0xCBF29CE484222325L
  private val FNV_PRIME = 0x100000001B3L

  /** Chunk start offsets (byte positions) of `bytes` under gear-CDC
    * with the given parameters — exposed for the boundary-invariant
    * specs; the first chunk always starts at 0. */
  def chunkStarts(bytes: Array[Byte], maskBits: Int, minSize: Int,
                  maxSize: Int): Array[Int] = {
    val mask = (1L << maskBits) - 1L
    val starts = Array.newBuilder[Int]
    var start = 0
    while (start < bytes.length) {
      starts += start
      var h = 0L
      var i = start
      var cut = -1
      val hardEnd = math.min(start + maxSize, bytes.length)
      while (cut < 0 && i < hardEnd) {
        h = (h << 1) + GEAR(bytes(i) & 0xFF)
        i += 1
        if (i - start >= minSize && (h & mask) == 0L) cut = i
      }
      start = if (cut > 0) cut else hardEnd
    }
    starts.result()
  }

  /** FNV-1a 64 of bytes[from, until). */
  private def fnv(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FNV_OFFSET
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xFF).toLong
      h *= FNV_PRIME
      i += 1
    }
    h
  }

  /** Chunk identity hashes of `bytes` — one FNV-1a 64 per CDC chunk, in
    * stream order; empty input → empty array. */
  def chunkHashes(bytes: Array[Byte], maskBits: Int, minSize: Int,
                  maxSize: Int): ArrayData = {
    val starts = chunkStarts(bytes, maskBits, minSize, maxSize)
    val out = new Array[Long](starts.length)
    var j = 0
    while (j < starts.length) {
      val until = if (j + 1 < starts.length) starts(j + 1) else bytes.length
      out(j) = fnv(bytes, starts(j), until)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** [[chunkHashes]] over a UTF8String's bytes (the string-column entry
    * point codegen calls). */
  def chunkHashes(s: UTF8String, maskBits: Int, minSize: Int,
                  maxSize: Int): ArrayData =
    chunkHashes(s.getBytes, maskBits, minSize, maxSize)
}

/** `cdc_chunks(payload)` :: array<bigint> — gear-CDC chunk identity
  * hashes of a string's UTF-8 bytes or a binary column's bytes.
  * Expected chunk size 2^maskBits bytes, clamped to [minSize, maxSize];
  * null propagates. Codegen'd kernel call — no UDF, stays inside
  * whole-stage codegen. */
case class CdcChunks(child: Expression, maskBits: Int = 6,
                     minSize: Int = 16, maxSize: Int = 256)
  extends UnaryExpression {
  require(maskBits >= 1 && maskBits <= 48, s"maskBits out of range: $maskBits")
  require(minSize >= 1 && maxSize >= minSize,
    s"need 1 <= minSize <= maxSize, got [$minSize, $maxSize]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects string or binary, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => CdcKernels.chunkHashes(s, maskBits, minSize, maxSize)
    case b: Array[Byte] => CdcKernels.chunkHashes(b, maskBits, minSize, maxSize)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.CdcKernels.chunkHashes($s, $maskBits, $minSize, $maxSize)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
