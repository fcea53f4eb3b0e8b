package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextQueries

/** Pins for the compression-ratio signal: the codegen'd kernel against
  * direct JVM deflate, the repetitive-vs-diverse separation the signal
  * exists for, and the plan shape (map-only). */
class CompressSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Reference: raw-deflate length via java.util.zip directly. */
  private def refDeflate(s: String): Int = {
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(s.getBytes("UTF-8"))
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  test("engine deflate length equals direct JVM deflate over the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextQueries.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val expected = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val t = r.getString(1)
      r.getLong(0) -> ((t.getBytes("UTF-8").length, refDeflate(t)))
    }.toMap
    assert(got == expected)
  }

  test("repetitive text scores a much lower ratio than diverse text") {
    val rnd = new scala.util.Random(11)
    val rep = Array.fill(200)("lorem ipsum dolor").mkString(" ")
    val div = Array.fill(200)(rnd.alphanumeric.take(17).mkString).mkString(" ")
    val d = Seq((0L, rep), (1L, div)).toDF("doc_id", "text")
    val rows = TextQueries.compressionRatio(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(0L) < 0.1, s"repetitive ratio must be tiny, got ${rows(0L)}")
    assert(rows(1L) > 0.5, s"high-entropy ratio must stay high, got ${rows(1L)}")
    // empty text -> null ratio, no divide-by-zero
    val e = TextQueries.compressionRatio(Seq((2L, "")).toDF("doc_id", "text")).collect()(0)
    assert(e.getInt(1) == 0 && e.isNullAt(3))
  }

  test("normalize kernel == regex chain on the corpus and adversarial inputs") {
    val docs = Tables.documents(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows(TextQueries.normalizeText(docs)) ==
      rows(TextQueries.normalizeTextRegex(docs)))
    // adversarial: mixed case, punctuation runs, unicode (multi-byte),
    // exotic lowercase (U+0130 lowers to i + combining dot), tabs,
    // leading/trailing/collapsed spaces, empty and all-stripped rows
    val adv = Seq(
      (0L, "  Hello,   WORLD!!  "),
      (1L, "a.b c\td—e"),
      (2L, "İstanbul ÉTÉ"),
      (3L, "๛๛๛"),
      (4L, ""),
      (5L, "A1 b2;C3"),
      (6L, "日本語 text 123")
    ).toDF("doc_id", "text")
    assert(rows(TextQueries.normalizeText(adv)) ==
      rows(TextQueries.normalizeTextRegex(adv)))
  }

  test("the signal plan is map-only (no exchange) and stays codegen'd") {
    val plan = TextQueries.compressionRatio(Tables.documents(spark, sfDir))
      .queryExecution.executedPlan
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"expected zero exchanges:\n$plan")
    val wsc = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, s"expected whole-stage codegen:\n$plan")
  }
}
