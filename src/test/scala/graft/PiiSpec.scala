package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.PiiQueries

/** PII detection/redaction pins: category counts on crafted spans,
  * placeholder substitution, idempotence (a redacted corpus re-scans
  * clean), and ground-truth hits on the planted driver-query spans.
  */
class PiiSpec extends AnyFunSuite {
  import SparkTestSession._

  test("piiStats counts each category; redactPii replaces with typed placeholders") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c@ex-ample.org and 10.0.0.1 then call +1 555-123-4567 ok"),
      (2L, "two mails x@y.io z@w.co"),
      (3L, "no pii here at all")
    ).toDF("doc_id", "text")
    val got = PiiQueries.piiStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got(1L) == ((1, 1, 1)))
    assert(got(2L) == ((2, 0, 0)))
    assert(got(3L) == ((0, 0, 0)))

    val red = df.select(col("doc_id"), PiiQueries.redactPii(col("text")).as("text"))
    val texts = red.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(1L) == "mail <EMAIL> and <IP> then call <PHONE> ok")
    assert(texts(2L) == "two mails <EMAIL> <EMAIL>")
    assert(texts(3L) == "no pii here at all")

    // idempotence: nothing PII-shaped survives redaction
    val again = PiiQueries.piiStats(red).collect()
    assert(again.forall(r => r.getInt(1) == 0 && r.getInt(2) == 0 && r.getInt(3) == 0))
  }

  test("cardStats: Luhn separates valid from invalid candidates; grouped form matches") {
    import spark.implicits._
    val df = Seq(
      (1L, "pay 4532015112830366 now"),        // valid, contiguous
      (2L, "pay 4111-1111-1111-1111 now"),     // valid, 4x4 grouped
      (3L, "ref 4532015112830367 now"),        // candidate, Luhn-INVALID
      (4L, "amex 378282246310005 ok"),         // valid, 15 digits (odd length)
      (5L, "short 123456789012 nope"),         // 12 digits: below the shape
      (6L, "two 4532015112830366 and 4532015112830367")
    ).toDF("doc_id", "text")
    val got = PiiQueries.cardStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got(1L) == ((1, 1)))
    assert(got(2L) == ((1, 1)))
    assert(got(3L) == ((1, 0)))
    assert(got(4L) == ((1, 1)))
    assert(got(5L) == ((0, 0)))
    assert(got(6L) == ((2, 1)))
    // redaction removes every candidate (valid or not): re-scan is clean
    val red = df.select(col("doc_id"),
      regexp_replace(col("text"), lit(PiiQueries.CardRe), lit("<CARD>")).as("text"))
    assert(PiiQueries.cardStats(red).collect().forall(_.getInt(1) == 0))
  }

  test("the planted-span driver query finds its category on every planted doc") {
    val got = PiiQueries.queries("txt_pii")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      if (id % 5 == 0) assert(r.getInt(1) >= 1, s"doc $id: planted email not found")
      if (id % 5 == 1) assert(r.getInt(2) >= 1, s"doc $id: planted IP not found")
      if (id % 5 == 2) assert(r.getInt(3) >= 1, s"doc $id: planted phone not found")
    }
  }
}
