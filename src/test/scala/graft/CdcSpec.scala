package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CdcKernels
import graft.text.TextQueries

/** Pins for gear-CDC chunking ([[graft.functions.CdcChunks]]): boundary
  * invariants, the shift-robustness property the family exists for,
  * string/binary parity, and the map-only plan shape. */
class CdcSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("chunk starts partition the input with sizes inside [min, max]") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(20000)(rnd.nextInt(256).toByte)
    val starts = CdcKernels.chunkStarts(data, maskBits = 6, minSize = 16, maxSize = 256)
    assert(starts.head == 0)
    assert(starts.sameElements(starts.sorted.distinct), "starts strictly increasing")
    val ends = starts.drop(1) :+ data.length
    val sizes = starts.zip(ends).map { case (s, e) => e - s }
    // every chunk except possibly the trailing remainder respects the
    // clamp; the last may be shorter than minSize
    assert(sizes.dropRight(1).forall(s => s >= 16 && s <= 256), sizes.mkString(","))
    assert(sizes.last <= 256 && sizes.sum == data.length)
    // the average must sit near the expected 2^maskBits + minSize regime
    // (loose band: this pins "content-defined", not an exact constant)
    val avg = data.length.toDouble / sizes.length
    assert(avg > 32 && avg < 256, s"avg chunk size $avg out of band")
    // empty input -> zero chunks
    assert(CdcKernels.chunkStarts(Array.emptyByteArray, 6, 16, 256).isEmpty)
  }

  test("boundaries are content-defined: a prefix edit preserves most chunk identities") {
    val rnd = new scala.util.Random(13)
    val doc = Array.fill(40000)(rnd.nextInt(256).toByte)
    def hashes(b: Array[Byte]): Seq[Long] = {
      val a = CdcKernels.chunkHashes(b, 6, 16, 256)
      (0 until a.numElements()).map(a.getLong)
    }
    val base = hashes(doc)
    // prepend 7 bytes — fixed-width chunking would shift EVERY chunk;
    // CDC must re-synchronize and keep the vast majority of identities
    val shifted = hashes(Array.fill(7)(1.toByte) ++ doc)
    val kept = shifted.toSet.intersect(base.toSet).size.toDouble / base.size
    assert(kept > 0.9, s"only ${kept * 100}%% of chunks survived a 7-byte prepend")
    // a single mid-document byte flip perturbs only the local chunks
    val edited = doc.clone(); edited(20000) = (edited(20000) ^ 0x5A).toByte
    val editKept = hashes(edited).toSet.intersect(base.toSet).size
    assert(base.size - editKept <= 3,
      s"a one-byte edit changed ${base.size - editKept} chunks")
    // determinism across calls
    assert(base == hashes(doc))
  }

  test("string and binary columns produce identical fingerprints") {
    val docs = Tables.documents(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val viaString = rows(TextQueries.cdcFingerprints(docs))
    val viaBinary = rows(TextQueries.cdcFingerprintsCol(
      docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
      col("payload")))
    assert(viaString == viaBinary)
    assert(viaString.exists(_._3 > 1), "fixture must produce multi-chunk docs")
  }

  test("cdcPairs finds byte-level near-identical docs with high containment") {
    val rnd = new scala.util.Random(29)
    val words = Array.fill(400)(rnd.alphanumeric.take(8).mkString)
    val a = words.mkString(" ")
    val b = "PREFIX added here " + a // a large shared byte run, shifted
    val c = Array.fill(400)(rnd.alphanumeric.take(8).mkString).mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = TextQueries.cdcPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got.contains((1L, 2L)), s"expected the shifted near-dup pair, got $got")
    assert(got((1L, 2L)) > 0.8, s"containment too low: ${got((1L, 2L))}")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)),
      "unrelated docs must not pair")
  }

  test("fingerprints are invariant under input partitioning; plan is map-only") {
    val docs = Tables.documents(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(rows(TextQueries.cdcFingerprints(docs)) ==
      rows(TextQueries.cdcFingerprints(docs.repartition(7))))
    val plan = TextQueries.cdcFingerprints(docs).queryExecution.executedPlan
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"expected zero exchanges:\n$plan")
  }
}
