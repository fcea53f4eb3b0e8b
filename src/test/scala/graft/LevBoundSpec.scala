package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.LevKernels

/** Value parity of the Myers bit-parallel bounded Levenshtein kernel
  * ([[graft.functions.LevKernels.boundedLev]]) against Spark's builtin
  * 3-arg `levenshtein` — the kernel is a drop-in inside
  * [[graft.text.TextQueries.levVerify]], so any divergence would change
  * every dedup_editdist_* result (and the streaming edit-distance gate,
  * which replays the same projection). */
class LevBoundSpec extends AnyFunSuite {
  import SparkTestSession._

  private def builtin(a: String, b: String, thr: Int): Int = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq((a, b, thr)).toDF("a", "b", "t")
      .select(expr("levenshtein(a, b, t)")).collect()(0).getInt(0)
  }

  private def kernel(a: String, b: String, thr: Int): Int =
    LevKernels.boundedLev(UTF8String.fromString(a), UTF8String.fromString(b), thr)

  test("hand cases: empty, equal, substitutions, indels, threshold edge") {
    val cases = Seq(
      ("", "", 0), ("", "abc", 3), ("", "abc", 2), ("abc", "", 5),
      ("kitten", "sitting", 3), ("kitten", "sitting", 2),
      ("abc", "abc", 0), ("abc", "abd", 0), ("abc", "abd", 1),
      ("ab", "ba", 2), ("ab", "ba", 1),
      ("aaaa", "bbbb", 4), ("aaaa", "bbbb", 3))
    for ((a, b, t) <- cases)
      assert(kernel(a, b, t) == builtin(a, b, t), s"($a, $b, $t)")
  }

  test("multi-block patterns (>64 and >128 code points) match the builtin") {
    val rnd = new scala.util.Random(7)
    def s(n: Int, alpha: Int): String =
      Array.fill(n)(('a' + rnd.nextInt(alpha)).toChar).mkString
    for (_ <- 1 to 60) {
      val a = s(40 + rnd.nextInt(160), 3) // crosses 1, 2 and 3 blocks
      val b = s(40 + rnd.nextInt(160), 3)
      for (t <- Seq(0, 1, 5, a.length / 2, a.length + b.length))
        assert(kernel(a, b, t) == builtin(a, b, t),
          s"len=(${a.length},${b.length}) thr=$t")
    }
  }

  test("near-duplicates with local edits (the verify stage's hot shape)") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(150)(('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 1 to 40) {
      val chars = base.toCharArray.toBuffer
      val edits = 1 + rnd.nextInt(6)
      for (_ <- 1 to edits) rnd.nextInt(3) match {
        case 0 => chars(rnd.nextInt(chars.length)) = ('a' + rnd.nextInt(4)).toChar
        case 1 => chars.insert(rnd.nextInt(chars.length), ('a' + rnd.nextInt(4)).toChar)
        case 2 if chars.length > 1 => chars.remove(rnd.nextInt(chars.length))
        case _ =>
      }
      val b = chars.mkString
      for (t <- Seq(edits, edits - 1, 75))
        assert(kernel(base, b, t) == builtin(base, b, t), s"edits=$edits thr=$t")
    }
  }

  test("code-point semantics: astral-plane characters count once, like the builtin") {
    val clef = new String(Character.toChars(0x1D11E)) // 2 UTF-16 units, 1 code point
    val cases = Seq(
      (clef, "a", 1), (clef + "abc", "abc", 1), (clef * 3, clef * 3, 0),
      (clef * 70 + "x", clef * 70 + "y", 1), // multi-block non-ASCII pattern
      ("ab" + clef + "cd", "abcd", 1))
    for ((a, b, t) <- cases)
      assert(kernel(a, b, t) == builtin(a, b, t), s"astral ($t)")
  }

  test("negative threshold rejects everything, matching the builtin") {
    assert(kernel("abc", "abc", -1) == builtin("abc", "abc", -1))
    assert(kernel("abc", "abd", -1) == builtin("abc", "abd", -1))
  }
}
