package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-phrase scanner (Aho & Corasick 1975) — the scale
  * path for C4/Gopher-style blocklist filtering: a production badword
  * list is hundreds of phrases, and per-phrase `contains` is
  * O(|list| × |text|) per row, while this automaton is one pass over
  * the text regardless of list size.
  *
  * Byte-level over the LOWERCASED UTF-8 bytes (same
  * `UTF8String.toLowerCase` as Spark's `lower`, the NormalizeKernels
  * precedent): a valid UTF-8 phrase always starts with a lead byte,
  * which never equals a continuation byte, so every byte-level match
  * aligns on a character boundary — byte matching IS substring
  * matching. Matches are counted at every position including
  * overlapping occurrences (the automaton's natural semantics; the
  * DuckDB oracle replays it as a position scan, not replace-counting,
  * which would miss overlaps).
  *
  * Goto transitions are BFS-completed into a dense DFA
  * (nodes × 256 ints — a 1k-phrase list is a few MB, shipped once per
  * executor as a codegen reference object); `cnt` folds the
  * fail-chain's phrase-end counts into each state so total hits are a
  * single array read per byte; distinct-phrase tracking walks the
  * dict-suffix chain only at match states.
  */
final class AcAutomaton(phrasesRaw: Array[String]) extends Serializable {
  require(phrasesRaw.nonEmpty, "blocklist must not be empty")
  require(phrasesRaw.forall(_.nonEmpty), "blocklist phrases must be non-empty")

  val nPhrases: Int = phrasesRaw.length

  /** Code-point length of each LOWERCASED phrase — span starts are
    * reported in code-point positions of the lowercased text (what
    * `substr` addresses in both engines). */
  private val phCharLen: Array[Int] = phrasesRaw.map { p =>
    val b = UTF8String.fromString(p).toLowerCase.getBytes
    var n = 0; var i = 0
    while (i < b.length) { if ((b(i) & 0xc0) != 0x80) n += 1; i += 1 }
    n
  }

  /** Byte length of each lowercased phrase — a DFA match ends at byte
    * i having consumed exactly these bytes of the lowercased text. */
  private val phByteLen: Array[Int] =
    phrasesRaw.map(p => UTF8String.fromString(p).toLowerCase.getBytes.length)

  // dense DFA built eagerly at construction (driver side, once)
  private val (next: Array[Array[Int]], cnt: Array[Int],
               dict: Array[Int], endIds: Array[Array[Int]]) = {
    val pats = phrasesRaw.map(p => UTF8String.fromString(p).toLowerCase.getBytes)
    // trie
    var cap = 16
    var nxt = Array.fill(cap)(null: Array[Int])
    var ends = Array.fill(cap)(List.empty[Int])
    var n = 1
    nxt(0) = Array.fill(256)(-1)
    pats.zipWithIndex.foreach { case (p, id) =>
      var st = 0
      p.foreach { b =>
        val c = b & 0xff
        if (nxt(st)(c) == -1) {
          if (n == cap) {
            cap *= 2
            nxt = java.util.Arrays.copyOf(nxt, cap)
            ends = java.util.Arrays.copyOf(ends, cap).asInstanceOf[Array[List[Int]]]
          }
          nxt(n) = Array.fill(256)(-1)
          if (ends(n) == null) ends(n) = Nil
          nxt(st)(c) = n
          n += 1
        }
        st = nxt(st)(c)
      }
      ends(st) = id :: (if (ends(st) == null) Nil else ends(st))
    }
    (0 until n).foreach(i => if (ends(i) == null) ends(i) = Nil)
    // BFS: fail links + DFA completion + dict-suffix links + counts
    val fail = new Array[Int](n)
    val d = new Array[Int](n)
    val c = ends.take(n).map(_.size)
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { ch =>
      val v = nxt(0)(ch)
      if (v == -1) nxt(0)(ch) = 0
      else { fail(v) = 0; queue.enqueue(v) }
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      d(u) = if (ends(fail(u)).nonEmpty) fail(u) else d(fail(u))
      c(u) += c(fail(u))
      (0 until 256).foreach { ch =>
        val v = nxt(u)(ch)
        // fail(u)'s row is already a complete DFA row (BFS order), so
        // nxt(fail(u))(ch) IS the longest proper suffix state for v
        if (v == -1) nxt(u)(ch) = nxt(fail(u))(ch)
        else { fail(v) = nxt(fail(u))(ch); queue.enqueue(v) }
      }
    }
    (nxt.take(n), c, d, ends.take(n).map(_.toArray))
  }

  /** One pass: returns [total match occurrences, distinct phrases hit]. */
  def scan(s: UTF8String): ArrayData = {
    val b = s.toLowerCase.getBytes
    val seen = new Array[Boolean](nPhrases)
    var st = 0
    var hits = 0L
    var distinct = 0
    var i = 0
    while (i < b.length) {
      st = next(st)(b(i) & 0xff)
      val c = cnt(st)
      if (c > 0) {
        hits += c
        var node = if (endIds(st).length > 0) st else dict(st)
        while (node != 0) {
          val ids = endIds(node)
          var j = 0
          while (j < ids.length) {
            if (!seen(ids(j))) { seen(ids(j)) = true; distinct += 1 }
            j += 1
          }
          node = dict(node)
        }
      }
      i += 1
    }
    new GenericArrayData(Array[Any](
      math.min(hits, Int.MaxValue).toInt, distinct))
  }

  /** One pass emitting every (phrase index, 1-based code-point start
    * position) match occurrence — overlapping included — over the
    * lowercased text, in scan order. The span-level form Dolma-style
    * attribute taggers emit. */
  def spans(s: UTF8String): ArrayData = {
    val b = s.toLowerCase.getBytes
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var st = 0
    var charIdx = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xc0) != 0x80) charIdx += 1
      st = next(st)(b(i) & 0xff)
      if (cnt(st) > 0) {
        var node = if (endIds(st).length > 0) st else dict(st)
        while (node != 0) {
          val ids = endIds(node)
          var j = 0
          while (j < ids.length) {
            out += org.apache.spark.sql.catalyst.InternalRow(
              ids(j), charIdx - phCharLen(ids(j)) + 1)
            j += 1
          }
          node = dict(node)
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Redact the LOWERCASED text: every maximal run of bytes covered by
    * any match (overlapping and abutting matches merge into one run)
    * is replaced by `placeholder`. Output is lowercase by construction
    * — matching happens on the lowercased bytes, and İ-style case
    * folds change byte offsets, so redacting the original casing would
    * need a byte-remap pass the semantics don't justify (curation
    * pipelines lowercase before hashing anyway). */
  def redact(s: UTF8String, placeholder: Array[Byte]): UTF8String = {
    val b = s.toLowerCase.getBytes
    // coverEnd(j) = exclusive end of a match starting at byte j (max
    // over matches), or 0 — one int array pass instead of interval sort
    var st = 0
    var anyHit = false
    val coverEnd = new Array[Int](b.length)
    var i = 0
    while (i < b.length) {
      st = next(st)(b(i) & 0xff)
      if (cnt(st) > 0) {
        anyHit = true
        var node = if (endIds(st).length > 0) st else dict(st)
        while (node != 0) {
          val ids = endIds(node)
          var j = 0
          while (j < ids.length) {
            val start = i + 1 - phByteLen(ids(j))
            if (i + 1 > coverEnd(start)) coverEnd(start) = i + 1
            j += 1
          }
          node = dict(node)
        }
      }
      i += 1
    }
    if (!anyHit) return UTF8String.fromBytes(b)
    val out = new java.io.ByteArrayOutputStream(b.length)
    i = 0
    var end = 0                      // exclusive end of the current covered run
    while (i < b.length) {
      if (coverEnd(i) > end) {
        // placeholder only at a run START — abutting matches (i == end
        // with prior coverage) extend the run without a second one
        if (i > end || end == 0) out.write(placeholder)
        end = coverEnd(i)
      } else if (i >= end) out.write(b(i).toInt)
      i += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }
}

/** `blocklist_stats(text)` :: array<int> — [0] total (overlapping)
  * occurrences of any blocklist phrase in the lowercased text, [1]
  * number of distinct phrases that occur. Codegen'd call into the
  * shared automaton (no UDF, stays inside whole-stage codegen); null
  * propagates.
  */
case class BlocklistStats(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac = new AcAutomaton(phrases.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"blocklist_stats expects string, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "blocklist_stats"

  override def nullSafeEval(input: Any): Any =
    ac.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trie = ctx.addReferenceObj("acTrie", ac, "graft.functions.AcAutomaton")
    defineCodeGen(ctx, ev, s => s"$trie.scan($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistStats =
    copy(child = newChild)
}

/** `blocklist_spans(text)` :: array<struct<ph:int, pos:int>> — every
  * (phrase index, 1-based code-point start) match occurrence of any
  * blocklist phrase over the lowercased text, overlaps included, in
  * scan order. The span-level attribute form (Dolma-style taggers);
  * same shared automaton, codegen'd, null propagates. */
case class BlocklistSpans(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac = new AcAutomaton(phrases.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"blocklist_spans expects string, got $other")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ph", IntegerType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "blocklist_spans"

  override def nullSafeEval(input: Any): Any =
    ac.spans(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trie = ctx.addReferenceObj("acTrie", ac, "graft.functions.AcAutomaton")
    defineCodeGen(ctx, ev, s => s"$trie.spans($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistSpans =
    copy(child = newChild)
}

/** `blocklist_redact(text)` :: string — the lowercased text with every
  * maximal run of match-covered bytes replaced by `placeholder`
  * (overlapping and abutting matches collapse to ONE placeholder).
  * Same shared automaton, codegen'd, null propagates. */
case class BlocklistRedact(child: Expression, phrases: Seq[String],
                           placeholder: String)
    extends UnaryExpression {

  @transient private lazy val ac = new AcAutomaton(phrases.toArray)
  @transient private lazy val phBytes =
    placeholder.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"blocklist_redact expects string, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "blocklist_redact"

  override def nullSafeEval(input: Any): Any =
    ac.redact(input.asInstanceOf[UTF8String], phBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trie = ctx.addReferenceObj("acTrie", ac, "graft.functions.AcAutomaton")
    val ph = ctx.addReferenceObj("phBytes", phBytes, "byte[]")
    defineCodeGen(ctx, ev, s => s"$trie.redact($s, $ph)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistRedact =
    copy(child = newChild)
}
