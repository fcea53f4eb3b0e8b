package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.ByteBpe

/** Pins for the byte-level (GPT-2-shape) BPE tokenizer: total byte
  * coverage (CJK / emoji / arbitrary UTF-8 never go OOV), hex-symbol
  * parity between the driver split and the Catalyst expression,
  * driver/distributed training parity, encode-stream reconstruction
  * (concatenated merged symbols == the original UTF-8 hex), and the
  * n_bytes/n_tokens accounting contract. */
class ByteBpeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def df(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("hexSyms: driver split equals the Catalyst expression, multi-byte included") {
    import spark.implicits._
    val words = Seq("He", " world", "héllo", "世界", "👋", "don't", "  ", "½")
    val got = words.toDF("word")
      .select(col("word"), ByteBpe.hexSymsExpr.as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    words.foreach { w =>
      assert(got(w) == ByteBpe.hexSyms(w), s"expr/driver hex split diverges on '$w'")
      // every symbol is one byte; count matches the UTF-8 octet length
      assert(got(w).forall(_.length == 2))
      assert(got(w).length == w.getBytes("UTF-8").length)
    }
  }

  test("byte fallback: CJK + emoji corpus encodes with zero OOV, stream reconstructs") {
    val docs = df("世界 世界 hello", "👋👋 hello world", "héllo naïve café")
    val merges = ByteBpe.train(docs, numMerges = 8)
    assert(merges.nonEmpty)
    val enc = ByteBpe.encode(docs, merges)
      .orderBy("doc_id").collect()
    assert(enc.length == 3, "every doc must survive encode — nothing is OOV")
    enc.foreach { r =>
      val nBytes = r.getAs[Long]("n_bytes")
      val nToks = r.getAs[Long]("n_tokens")
      assert(nToks >= 1 && nToks <= nBytes,
        s"tokens must be merged bytes: n_tokens=$nToks n_bytes=$nBytes")
    }
    // merges actually fired on the repeated CJK/ASCII content
    assert(enc.exists(r => r.getAs[Long]("n_tokens") < r.getAs[Long]("n_bytes")))
  }

  test("encode stream: concatenated merged symbols reproduce the exact UTF-8 hex") {
    // rank-ordered replay on the driver must rebuild every pretoken's bytes
    val docs = df("ab ab ab cd", "👋 ab 世界")
    val merges = ByteBpe.train(docs, numMerges = 5)
    val ranks = merges.map { case (rk, l, r) => (l, r) -> rk }.toMap
    val pretoks = Seq("ab", " ab", " cd", "👋", " 世界")
    pretoks.foreach { w =>
      val syms = graft.text.TextQueries.encodeWordDriver(w, ranks, ByteBpe.hexSyms)
      assert(syms.mkString == ByteBpe.hexSyms(w).mkString,
        s"merge replay must be a partition of the byte stream for '$w'")
    }
  }

  test("driver and distributed training produce the identical merge table") {
    val docs = df("the cat sat on the mat", "the bat and the rat", "世界 the 世界")
    val a = ByteBpe.train(docs, numMerges = 6)
    val b = ByteBpe.train(docs, numMerges = 6, maxDriverVocab = 0L) // force distributed
    assert(a == b, s"driver=$a distributed=$b")
  }

  test("driver and distributed encode agree (counts and stream hash)") {
    val docs = df("the cat sat on the mat", "emoji 👋 and cjk 世界", "don't stop")
    val merges = ByteBpe.train(docs, numMerges = 6)
    val a = ByteBpe.encode(docs, merges).orderBy("doc_id").collect().toSeq
    val b = ByteBpe.encode(docs, merges, maxDriverVocab = 0L)
      .orderBy("doc_id").collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("GPT-2 pretokens carry their leading space; contractions split") {
    import spark.implicits._
    // NOTE: lit(), not a SQL string literal — Spark SQL literals eat
    // backslashes (`\p{L}` → `p{L}`), DuckDB standard strings don't;
    // that asymmetry is why the oracle embeds the pattern raw.
    val toks = Seq("don't stop me").toDF("text")
      .select(regexp_extract_all(col("text"),
        lit(graft.text.TextQueries.BpeishPattern), lit(0)))
      .as[Seq[String]].head()
    assert(toks == Seq("don", "'t", " stop", " me"), toks.toString)
  }

  test("oracle SQL replays the merge fold (DuckDB-portable shape)") {
    // structural pin: hex init with doubled delimiters, no </w> marker,
    // BIGINT casts on every sum (the driver hash is type-sensitive)
    val sql = ByteBpe.encodeSqlFor(Seq((0, "48", "65"), (1, "4865", "6C")))
    assert(sql.contains("regexp_replace(hex(encode(word)), '([0-9A-F]{2})'"))
    assert(sql.contains("replace(replace(concat("))
    assert(sql.contains("' 48  65 ', ' 4865 '"))
    assert(sql.contains("' 4865  6C ', ' 48656C '"))
    assert(!sql.contains("</w>"))
    assert(sql.contains("CAST(sum(octet_length(encode(word))) AS BIGINT)"))
    assert(sql.contains("CAST(sum(len(string_split(encoded, ' '))) AS BIGINT)"))
  }

  test("sf0.001 corpus: encode is deterministic and repartition-invariant") {
    val docs = Tables.documents(spark, sfDir)
    val merges = ByteBpe.train(docs, numMerges = 10)
    val a = ByteBpe.encode(docs, merges).orderBy("doc_id").collect().toSeq
    val b = ByteBpe.encode(docs.repartition(7), merges).orderBy("doc_id").collect().toSeq
    assert(a.nonEmpty)
    assert(a.map(_.toString) == b.map(_.toString))
  }
}
