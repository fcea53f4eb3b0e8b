package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.UnigramLm

/** Pins for the unigram-LM tokenizer: EM training behavior, the
  * driver/distributed parity contract, and the Viterbi expr-DP against
  * the driver reference. */
class UnigramLmSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("train learns the dominant multi-char piece on a repetitive corpus") {
    import spark.implicits._
    val d = Seq((0L, "abab abab ab abab"), (1L, "ab abab ab"))
      .toDF("doc_id", "text")
    val pieces = UnigramLm.train(d, vocabSize = 4, maxPieceLen = 4, seedSize = 8)
    val m = pieces.toMap
    assert(m.contains("a") && m.contains("b"), "single chars are never pruned")
    assert(m.contains("ab"), s"the dominant subword must survive pruning: $pieces")
    // probabilities normalize (up to micro-unit quantization)
    val mass = pieces.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(mass - 1.0) < 1e-3, s"piece mass must be ~1, got $mass")
    assert(m("ab") > m("a"), "the frequent piece must outweigh its chars")
  }

  test("driver and distributed training paths produce the identical table") {
    val a = UnigramLm.train(docs, vocabSize = 48, maxPieceLen = 5, seedSize = 128)
    val b = UnigramLm.trainDistributed(docs, vocabSize = 48, maxPieceLen = 5, seedSize = 128)
    assert(a == b, s"paths diverge:\n driver=$a\n dist  =$b")
    // and the table is invariant under corpus partitioning
    val c = UnigramLm.train(docs.repartition(13), vocabSize = 48, maxPieceLen = 5, seedSize = 128)
    assert(a == c, "training must not depend on partitioning")
  }

  test("viterbi prefers the higher-scoring segmentation and breaks ties to the longer piece") {
    val pieces = Map("a" -> -2.0, "b" -> -2.0, "ab" -> -1.5)
    assert(UnigramLm.viterbiDriver("abab", pieces, 4) == Seq("ab", "ab"))
    // exact tie: lp(xy) == lp(x)+lp(y) -> longest-piece preference wins
    val tie = Map("x" -> -1.0, "y" -> -1.0, "xy" -> -2.0)
    assert(UnigramLm.viterbiDriver("xy", tie, 4) == Seq("xy"))
    // unknown characters fall back to single-char UNK steps
    assert(UnigramLm.viterbiDriver("aqb", pieces, 4) == Seq("a", "q", "b"))
  }

  test("the expr DP encodes exactly like the driver reference over the corpus") {
    val pieces = UnigramLm.train(docs, vocabSize = 48, maxPieceLen = 5, seedSize = 128)
    val got = UnigramLm.encode(docs, pieces, maxPieceLen = 5).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val pm = pieces.toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val words = r.getString(1).split(" ", -1)
      val streams = words.map(w => UnigramLm.viterbiDriver(w, pm, 5))
      val stream = streams.flatten.mkString(" ")
      val hash = md.digest(stream.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      r.getLong(0) -> ((words.length.toLong, streams.map(_.length.toLong).sum, hash))
    }.toMap
    assert(got == expected, "engine Viterbi must equal the driver reference")
  }
}
