package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextQueries

/** Pins for the composed curate-tokenize-pack pipeline
  * ([[TextQueries.corpusTokenize]]): equality with the staged
  * composition it claims to fuse, and the pack-layout invariants in
  * encoded-token space. */
class TokenizePipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  private def layout(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("corpus_tokenize equals the staged clean -> train -> encode -> pack composition") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") >= 10)
    val bench = docs.filter(col("doc_id") < 10)
    val got = layout(TextQueries.corpusTokenize(corpus, bench))
    val cleaned = TextQueries.corpusClean(corpus, bench, keepText = true)
    val merges = TextQueries.bpeTrain(cleaned, numMerges = 20)
    val enc = TextQueries.bpeEncode(cleaned, merges)
    val staged = layout(TextQueries.packCounts(
      enc.select(col("doc_id"), col("n_tokens")), budget = 512L))
    assert(got == staged, "fused pipeline must equal the staged composition")
    spark.catalog.clearCache()
  }

  test("the pack layout partitions the encoded token stream exactly") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") >= 10)
    val bench = docs.filter(col("doc_id") < 10)
    val out = TextQueries.corpusTokenize(corpus, bench)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per-doc slices reassemble the doc's full encoded count, gap-free
    val cleaned = TextQueries.corpusClean(corpus, bench, keepText = true)
    val merges = TextQueries.bpeTrain(cleaned, numMerges = 20)
    val nTok = TextQueries.bpeEncode(cleaned, merges)
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perDoc = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(perDoc == nTok, "per-doc slice lengths must sum to the encoded count")
    // every chunk except the last holds exactly `budget` tokens
    val perChunk = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val lastChunk = perChunk.keys.max
    perChunk.foreach { case (cid, tot) =>
      if (cid != lastChunk) assert(tot == 512L, s"chunk $cid holds $tot tokens")
      else assert(tot >= 1L && tot <= 512L)
    }
    // offsets within a doc are contiguous from 0
    rows.groupBy(_._2).foreach { case (_, slices) =>
      val sorted = slices.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3, s"gap in $a -> $b")
        case _ =>
      }
    }
    spark.catalog.clearCache()
  }
}
