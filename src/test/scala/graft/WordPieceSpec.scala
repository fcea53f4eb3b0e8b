package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.WordPiece

/** Pins for the WordPiece tokenizer: the likelihood-score merge
  * criterion, driver/distributed training parity, the greedy
  * longest-match walk (expr vs driver reference), and the BERT [UNK]
  * whole-word failure contract. */
class WordPieceSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("training merges by likelihood score, not raw pair frequency") {
    import spark.implicits._
    // "ab" appears 12x as a pair; "cd" only 3x — but c and d occur ONLY
    // together (score 3/(3*3)=0.333) while a and b are diluted by solo
    // occurrences in "axb" (score 12/(16*16)≈0.047): WordPiece must fuse
    // cd first, where plain BPE would fuse ab first.
    val d = Seq(
      (0L, Array.fill(12)("ab").mkString(" ")),
      (1L, Array.fill(4)("axb").mkString(" ")),
      (2L, Array.fill(3)("cd").mkString(" "))
    ).toDF("doc_id", "text")
    val vocab = WordPiece.train(d, numMerges = 1)
    val tokens = vocab.map(_._2)
    assert(tokens.contains("cd"), s"likelihood score must pick (c,##d) first: $vocab")
    assert(!tokens.contains("ab"), s"raw-frequency pick must lose: $vocab")
    // and the BPE trainer on the same corpus does NOT pick (c, d) —
    // its raw-frequency criterion goes for a frequent pair instead
    val bpe = graft.text.TextQueries.bpeTrain(d, numMerges = 1)
    assert((bpe.head._2, bpe.head._3) != (("c", "d")),
      s"BPE control must differ from the likelihood pick: $bpe")
  }

  test("merged symbols keep the ## continuation class") {
    import spark.implicits._
    val d = Seq((0L, "abc abc abc")).toDF("doc_id", "text")
    val vocab = WordPiece.train(d, numMerges = 2).map(_._2)
    // alphabet is a, ##b, ##c; merges fuse within the word — every merged
    // token must be either word-initial (no ##) extending 'a', or a ##
    // continuation; a bare "bc" token would break the position class
    val merged = vocab.filter(t => WordPiece.span(t) > 1)
    assert(merged.nonEmpty)
    merged.foreach { t =>
      assert(t.startsWith("a") || t.startsWith("##"),
        s"merged token '$t' lost its position class (vocab=$vocab)")
    }
    assert(!vocab.contains("bc"), s"unprefixed continuation leaked: $vocab")
  }

  test("driver and distributed training paths produce the identical vocabulary") {
    val a = WordPiece.train(docs, numMerges = 30)
    val b = WordPiece.trainDistributedOf(docs, numMerges = 30)
    assert(a == b, s"paths diverge:\n driver=$a\n dist  =$b")
    val c = WordPiece.train(docs.repartition(13), numMerges = 30)
    assert(a == c, "training must not depend on partitioning")
  }

  test("driver/distributed parity holds on a CJK + adjacency stress corpus") {
    import spark.implicits._
    val d = Seq(
      (0L, "今日は 今日 今日は abab abab"),
      (1L, "aaaa aaa abab 今日")
    ).toDF("doc_id", "text")
    val a = WordPiece.train(d, numMerges = 6)
    val b = WordPiece.trainDistributedOf(d, numMerges = 6)
    assert(a == b, s"paths diverge on CJK/adjacency:\n driver=$a\n dist  =$b")
  }

  test("greedy reference: longest match first, whole-word [UNK] on any gap") {
    val vocab = Set("un", "##aff", "##able", "##ffa", "a", "##b", "##a")
    // longest-first: "##aff" beats "##a"; then "##able"? no — after
    // un|aff the rest is "able": "##able" matches as the longest
    assert(WordPiece.encodeWordDriver("unaffable", vocab) == Seq("un", "##aff", "##able"))
    // a gap anywhere fails the WHOLE word, not just the tail
    assert(WordPiece.encodeWordDriver("unaffz", vocab) == Seq("[UNK]"))
    // word-initial continuation tokens never match at position 0
    assert(WordPiece.encodeWordDriver("able", vocab) == Seq("[UNK]"))
    // maxInputChars overflow -> [UNK]
    assert(WordPiece.encodeWordDriver("ab", Set("a", "##b"), maxInputChars = 1) == Seq("[UNK]"))
  }

  test("the expr walk encodes exactly like the driver reference over the corpus") {
    val vocab = WordPiece.train(docs, numMerges = 30)
    val got = WordPiece.encode(docs, vocab).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val vs = vocab.map(_._2).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val words = r.getString(1).split(" ", -1)
      val streams = words.map(w => WordPiece.encodeWordDriver(w, vs))
      val stream = streams.flatten.mkString(" ")
      val hash = md.digest(stream.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      r.getLong(0) -> ((words.length.toLong, streams.map(_.length.toLong).sum, hash))
    }.toMap
    assert(got == expected, "engine greedy walk must equal the driver reference")
  }

  test("the expr walk handles [UNK] words (vocabulary missing a character)") {
    import spark.implicits._
    val d = Seq((0L, "ab zq ab")).toDF("doc_id", "text")
    // train on a different corpus so z/q are out-of-alphabet
    val vocab = WordPiece.train(Seq((0L, "ab ab ab")).toDF("doc_id", "text"), numMerges = 1)
    val row = WordPiece.encode(d, vocab).collect().head
    // 3 words; "ab" -> 1 token each (merged), "zq" -> [UNK]
    assert(row.getLong(1) == 3L && row.getLong(2) == 3L,
      s"expected 3 words / 3 tokens, got $row")
    val vs = vocab.map(_._2).toSet
    assert(WordPiece.encodeWordDriver("zq", vs) == Seq("[UNK]"))
  }
}
