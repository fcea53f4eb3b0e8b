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

  /** Reference span scan: 1-based code-point starts of overlapping
    * occurrences over the lowercased text. */
  private def refSpans(t: String, ps: Seq[String]): Set[(String, Int)] = {
    val tl = UTF8String.fromString(t).toLowerCase.toString
    ps.flatMap { p =>
      val pl = UTF8String.fromString(p).toLowerCase.toString
      var i = tl.indexOf(pl)
      val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
      while (i >= 0) {
        acc += ((p, tl.codePointCount(0, i) + 1))
        i = tl.indexOf(pl, i + 1)
      }
      acc
    }.toSet
  }

  test("span output matches the naive position scan on the corpus") {
    val phrases = Seq("dup", "slow query", "big data", "a a")
    val docs = Tables.documents(spark, sfDir)
    val got = TextQueries.blocklistSpans(docs, phrases).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val expected = docs.select(col("doc_id"), col("text")).collect().flatMap { r =>
      refSpans(r.getString(1), phrases).map { case (p, i) => (r.getLong(0), p, i) }
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture must produce spans")
  }

  test("span positions are code-point indexed across multi-byte text") {
    val phrases = Seq("日本", "he", "a a")
    val d = Seq(
      (0L, "語語日本語の日本 HE"),   // 日本 at cp 3 and 7; he at cp 10
      (1L, "ÉtÉ a a a")             // a a at cp 5 and 7 (overlap)
    ).toDF("doc_id", "text")
    val got = TextQueries.blocklistSpans(d, phrases).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(
      (0L, "日本", 3), (0L, "日本", 7), (0L, "he", 10),
      (1L, "a a", 5), (1L, "a a", 7)))
  }

  test("redaction merges overlapping and abutting matches into one placeholder") {
    def red(text: String, ps: Seq[String]): String =
      TextQueries.blocklistRedact(
        Seq((0L, text)).toDF("doc_id", "text"), ps, "<x>")
        .collect()(0).getString(1)
    assert(red("ababa", Seq("aba")) == "<x>")          // overlap → one run
    assert(red("abab!", Seq("ab")) == "<x>!")          // abutting → one run
    assert(red("ab cd AB", Seq("ab")) == "<x> cd <x>") // runs stay separate, case folds
    assert(red("日本語の本", Seq("本")) == "日<x>語の<x>")
    assert(red("xyz", Seq("ab")) == "xyz")             // untouched (but lowercased) text
    assert(red("XYZ", Seq("ab")) == "xyz")
    assert(red("", Seq("ab")) == "")
    // a longer match starting inside a run extends it
    assert(red("aabba", Seq("aa", "abb", "ba")) == "<x>")
    val n = TextQueries.blocklistRedact(
      Seq((0L, None: Option[String])).toDF("doc_id", "text"), Seq("ab"), "<x>")
      .collect()(0)
    assert(n.isNullAt(1))
  }

  test("blocklistKeep composes into corpusClean's extraFilter") {
    val all = Tables.documents(spark, sfDir)
    val bench = all.filter(col("doc_id") < 10)
    val corpus = all.filter(col("doc_id") >= 10)
    val phrases = Seq("dup", "slow query")
    val gated = TextQueries.corpusClean(corpus, bench,
      persistIntermediate = false,
      extraFilter = Some(TextQueries.blocklistKeep(phrases)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = TextQueries.corpusClean(corpus, bench,
      persistIntermediate = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val blKeep = TextQueries.blocklistFilter(corpus, phrases)
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    // the gated pipeline never keeps a blocked doc; dedup
    // representatives may shift when a cluster's min-id is blocked, so
    // subset — not set algebra against the plain run — is the invariant
    assert(gated.subsetOf(blKeep))
    assert(gated.nonEmpty && gated != plain,
      "the blocklist stage must actually bite on the fixture")
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
    val spanPlan = TextQueries.blocklistSpans(
      Tables.documents(spark, sfDir), Seq("dup"))
      .queryExecution.executedPlan
    assert(spanPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"span plan must be map-only:\n$spanPlan")
  }
}
