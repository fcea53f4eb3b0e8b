package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-parallel thresholded Levenshtein distance (Myers 1999, "A fast
  * bit-vector algorithm for approximate string matching based on
  * dynamic programming", JACM 46(3); multi-word block formulation after
  * Hyyrö 2003). Drop-in replacement for Spark's 3-arg
  * `levenshtein(l, r, threshold)` — returns the EXACT distance when it
  * is ≤ threshold and -1 otherwise, counting CODE POINTS exactly like
  * the builtin (parity spec-pinned, including astral-plane input) —
  * at 1/64th the inner-loop cost: the builtin's banded DP explores
  * O(L·thr) cells one at a time, and the dedup verify stages run it at
  * thr = L/2 (sim_ppm ≥ 500000 ⟺ dist ≤ L/2), i.e. O(L²/2) cell
  * updates per candidate pair; Myers processes 64 DP rows per word op,
  * O(L·⌈L/64⌉) word ops with no data-dependent branches. Measured on
  * the sf0.1 editdist verify stage (8.1k candidate pairs of ~2.5 KB
  * texts): the DP dominated all four dedup_editdist_* queries.
  *
  * The column loop carries the bottom-row score; a column whose best
  * possible final score (score − columns remaining) exceeds the
  * threshold exits early — the same sound abandonment rule as the
  * builtin's band, so heavily-dissimilar candidate pairs stay cheap.
  */
object LevKernels {

  /** Exact levenshtein(a, b) if ≤ threshold, else -1. */
  def boundedLev(aU: UTF8String, bU: UTF8String, threshold: Int): Int = {
    if (threshold < 0) return -1
    if (aU.equals(bU)) return 0
    // pattern = shorter string (fewer bit blocks), text = longer
    var p = aU.toString.codePoints.toArray
    var t = bU.toString.codePoints.toArray
    if (p.length > t.length) { val tmp = p; p = t; t = tmp }
    val m = p.length
    val n = t.length
    if (n - m > threshold) return -1 // |len diff| lower-bounds the distance
    if (m == 0) return n             // n ≤ threshold by the check above
    val blocks = (m + 63) >>> 6
    // Peq: per pattern block, the positions each alphabet symbol occupies.
    // ASCII fast path (flat array); anything else through a hash map.
    val peqAscii = new Array[Long](128 * blocks)
    var peqOther: java.util.HashMap[Integer, Array[Long]] = null
    var i = 0
    while (i < m) {
      val c = p(i)
      if (c < 128) peqAscii(c * blocks + (i >>> 6)) |= 1L << (i & 63)
      else {
        if (peqOther == null) peqOther = new java.util.HashMap
        var arr = peqOther.get(c)
        if (arr == null) { arr = new Array[Long](blocks); peqOther.put(c, arr) }
        arr(i >>> 6) |= 1L << (i & 63)
      }
      i += 1
    }
    val pv = new Array[Long](blocks)
    val mv = new Array[Long](blocks)
    java.util.Arrays.fill(pv, -1L)
    val lastBit = 1L << ((m - 1) & 63) // the bottom DP row's bit in the last block
    var score = m
    var j = 0
    while (j < n) {
      val c = t(j)
      val eqOther: Array[Long] =
        if (c < 128 || peqOther == null) null else peqOther.get(c)
      var hin = 1 // top boundary row: d(0, j) = j, horizontal delta +1
      var b = 0
      while (b < blocks) {
        var eq =
          if (c < 128) peqAscii(c * blocks + b)
          else if (eqOther != null) eqOther(b)
          else 0L
        val pvb = pv(b)
        val mvb = mv(b)
        val xv = eq | mvb
        if (hin < 0) eq |= 1L
        val xh = (((eq & pvb) + pvb) ^ pvb) | eq
        var ph = mvb | ~(xh | pvb)
        var mh = pvb & xh
        val top = if (b == blocks - 1) lastBit else java.lang.Long.MIN_VALUE
        val hout = if ((ph & top) != 0L) 1 else if ((mh & top) != 0L) -1 else 0
        ph <<= 1
        mh <<= 1
        if (hin < 0) mh |= 1L else if (hin > 0) ph |= 1L
        pv(b) = mh | ~(xv | ph)
        mv(b) = ph & xv
        hin = hout
        b += 1
      }
      score += hin // the last block's hout is the bottom-row delta
      // sound early abandonment: the score can fall at most 1 per
      // remaining column, so this lower bound on the final distance
      // is exact-in-the-limit and never rejects a passing pair
      if (score - (n - 1 - j) > threshold) return -1
      j += 1
    }
    if (score <= threshold) score else -1
  }
}

/** `lev_bound(l, r, threshold)` :: int — exact Levenshtein distance if
  * ≤ threshold, else -1; the Myers bit-parallel drop-in for the builtin
  * 3-arg `levenshtein` (value parity spec-pinned). Null propagates;
  * codegen'd kernel call, no UDF. */
case class LevenshteinBound(first: Expression, second: Expression,
                            third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lev_bound expects (string, string, int), got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lev_bound"

  override def nullSafeEval(l: Any, r: Any, t: Any): Any =
    LevKernels.boundedLev(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], t.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r, t) =>
      s"graft.functions.LevKernels.boundedLev($l, $r, $t)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): LevenshteinBound =
    copy(first = newFirst, second = newSecond, third = newThird)
}
