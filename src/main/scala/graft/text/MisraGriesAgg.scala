package graft.text

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary (Misra & Gries 1982) as a Catalyst
  * `TypedImperativeAggregate`: a bounded map of at most `k` (token,
  * count) entries per partition, merged with the (k+1)-th-largest-count
  * subtraction of Agarwal et al. 2012 ("Mergeable summaries"), which
  * preserves the sketch guarantee across any merge tree: every item
  * with true frequency > n/(k+1) is present in the final summary.
  *
  * The sketch is candidate GENERATION only — counts are underestimates
  * and merge-order-dependent, so [[TextQueries.heavyHitters]] verifies
  * candidates with an exact second pass and publishes exact counts
  * (deterministic output regardless of partitioning, oracle-matched).
  * eval() therefore returns just the candidate token array (sorted).
  *
  * Scale shape: one pass, k-bounded memory per partition, and only
  * numPartitions × k entries ever move over the wire — against a full
  * `groupBy(token)` whose shuffle is the whole token inventory. The
  * amortized update cost is O(1): a decrement-all event (new key, full
  * map) consumes k previously-added count units, and only n units are
  * ever added.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 1, s"misra_gries: capacity must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a string column, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val t = v.asInstanceOf[UTF8String]
    buffer.get(t) match {
      case Some(c) => buffer.update(t, c + 1)
      case None if buffer.size < k =>
        // the eval'd UTF8String may point into a reused row buffer —
        // copy before it becomes a map key
        buffer.update(t.clone(), 1L)
      case None =>
        // decrement-all; the new key enters at 1−1 = 0, i.e. not at all
        val dead = buffer.iterator.collect { case (key, 1L) => key }.toArray
        buffer.mapValuesInPlace((_, c) => c - 1)
        dead.foreach(buffer.remove)
    }
    buffer
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
                     b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      // (the mergeable-summaries reduction: error grows to the union's
      // n/(k+1), never beyond)
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - (k + 1))
      val dead = b1.iterator.collect { case (key, c) if c <= m => key }.toArray
      dead.foreach(b1.remove)
      b1.mapValuesInPlace((_, c) => c - m)
    }
    b1
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(
      buffer.keysIterator.toArray.sortBy(_.toString).map(_.asInstanceOf[Any]))

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (t, c) =>
      val bytes = t.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  /** Candidate heavy hitters of a string column as a sorted array. */
  def mgCandidates(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.aggColumn(
      MisraGriesAgg(org.apache.spark.sql.GraftBridge.expression(c), k))
}
