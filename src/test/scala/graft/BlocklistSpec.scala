package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.AcAutomaton
import graft.text.TextQueries

/** Pins for the Aho-Corasick blocklist scanner: automaton vs a naive
  * per-phrase sliding scan (the O(|list|·|text|) semantics it replaces),
  * overlapping-occurrence counting, dict-suffix distinct tracking,
  * multi-byte alignment, case folding, nulls, and the map-only plan. */
class BlocklistSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Reference semantics: overlapping occurrences of `p` in `t`, both
    * folded through the same UTF8String.toLowerCase the kernel uses. */
  private def refCount(t: String, p: String): Int = {
    val tl = UTF8String.fromString(t).toLowerCase.toString
    val pl = UTF8String.fromString(p).toLowerCase.toString
    var i = tl.indexOf(pl); var n = 0
    while (i >= 0) { n += 1; i = tl.indexOf(pl, i + 1) }
    n
  }

  private def refStats(t: String, ps: Seq[String]): (Int, Int) = {
    val counts = ps.map(refCount(t, _))
    (counts.sum, counts.count(_ > 0))
  }

  test("automaton matches the naive per-phrase scan on the corpus") {
    val phrases = Seq("dup", "slow query", "big data", "a a")
    val docs = Tables.documents(spark, sfDir)
    val got = TextQueries.blocklistFilter(docs, phrases).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    val expected = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val (h, d) = refStats(r.getString(1), phrases)
      r.getLong(0) -> ((h, d, h == 0))
    }.toMap
    assert(got == expected)
    assert(expected.values.exists(_._1 > 0), "fixture must exercise hits")
    assert(expected.values.exists(_._1 == 0), "fixture must exercise keeps")
  }

  test("overlaps count and dict-suffix chains surface every distinct phrase") {
    // 'a a a a' has THREE overlapping 'a a' occurrences (replace-counting
    // would find two); 'ushers' ends states where 'she' reaches 'he' and
    // 'hers' only via the dict-suffix chain
    val phrases = Seq("he", "she", "hers", "a a")
    val ac = new AcAutomaton(phrases.toArray)
    def scan(s: String): (Int, Int) = {
      val a = ac.scan(UTF8String.fromString(s))
      (a.getInt(0), a.getInt(1))
    }
    assert(scan("a a a a") == ((3, 1)))
    assert(scan("ushers") == ((3, 3)))      // she, he, hers
    assert(scan("hehehe") == ((3, 1)))      // he ×3, overlap-free
    assert(scan("HE SHE") == ((3, 2)))      // case-folded: he, she, (s)he
    assert(scan("") == ((0, 0)))
    assert(scan("nothing here... well, herself") == ((3, 2))) // he ×2 (here, herself) + hers ×1
  }

  test("multi-byte phrases match on character boundaries with overlaps") {
    val ac = new AcAutomaton(Array("日本", "ÉtÉ", "日本語"))
    def scan(s: String): (Int, Int) = {
      val a = ac.scan(UTF8String.fromString(s))
      (a.getInt(0), a.getInt(1))
    }
    assert(scan("日本語の日本") == ((3, 2)))  // 日本 ×2 + 日本語 ×1
    assert(scan("été et ÉTÉ") == ((2, 1)))
    assert(scan("本語") == ((0, 0)))          // continuation-byte prefix never matches
  }

  test("null text propagates and empty/blank blocklists are rejected") {
    val d = Seq((0L, Some("dup here")), (1L, None: Option[String]))
      .toDF("doc_id", "text")
    val rows = TextQueries.blocklistFilter(d, Seq("dup")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(rows == Map(0L -> Some(1), 1L -> None))
    intercept[IllegalArgumentException](new AcAutomaton(Array.empty[String]))
    intercept[IllegalArgumentException](new AcAutomaton(Array("ok", "")))
  }

  test("the blocklist plan is map-only and stays codegen'd") {
    val plan = TextQueries.blocklistFilter(
      Tables.documents(spark, sfDir), Seq("dup", "slow query"))
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
