package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.text.TextQueries

/** Property-based invariants of the text-pipeline primitives over
  * seeded random corpora (the [[BinningPropertySpec]] idiom:
  * deterministic Gen samples, no flaky shrinkage).
  */
class TextPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val vocab = Vector("the", "a", "of", "and", "spark", "scan",
    "merge", "window", "hash", "batch")
  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 24)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")
  private val langGen: Gen[String] = Gen.oneOf("en", "de", "fr")

  /** Deterministic sample corpus i: (doc_id, text, lang). */
  private def corpus(i: Int, n: Int = 40): Seq[(Long, String, String)] =
    (0 until n).map { d =>
      val s = Seed(1000L * i + d)
      (d.toLong,
        docGen(Gen.Parameters.default, s).get,
        langGen(Gen.Parameters.default, s.next).get)
    }

  test("globalCumsum == single-partition window reference on random values") {
    val valueGen: Gen[Long] = Gen.chooseNum(-50L, 50L)
    for (i <- 0 until 5) {
      val rows: Seq[(Long, Long)] = (0 until 200).map { k =>
        (k.toLong, valueGen(Gen.Parameters.default, Seed(7L * i + k)).get)
      }
      val df = rows.toDF("id", "v").repartition(7)
      val got = graft.ops.Stitch.globalCumsum(df,
          chunk = col("id") / 25, ord = Seq(col("id")), value = col("v"), out = "cum")
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var run = 0L
      val want = rows.sortBy(_._1).map { case (id, v) => run += v; id -> run }.toMap
      assert(got == want, s"sample $i")
    }
  }

  test("corpusSplit: total, disjoint, partition-invariant on random corpora") {
    for (i <- 0 until 3) {
      val d = corpus(i).toDF("doc_id", "text", "lang")
      val got = TextQueries.corpusSplit(d).collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(got.length == 40 && got.map(_._1).distinct.length == 40,
        "exactly one split per document")
      assert(got.forall(kv => Set("train", "val", "test")(kv._2)))
      val rep = TextQueries.corpusSplit(d.repartition(11)).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rep == got.toMap, "assignment is a pure function of doc_id")
    }
    // impossible fractions fail fast instead of silently eating the
    // test split
    intercept[IllegalArgumentException] {
      TextQueries.corpusSplit(corpus(0).toDF("doc_id", "text", "lang"),
        trainPpm = 990000L, valPpm = 20000L)
    }
  }

  test("fused DSIR == two-frame DSIR on random corpora") {
    for (i <- 0 until 3) {
      val d = corpus(i).toDF("doc_id", "text", "lang")
      val fused = TextQueries.dsirWeightsOf(d, col("lang") === "en", buckets = 256)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val two = TextQueries.dsirWeights(d, d.filter(col("lang") === "en"), buckets = 256)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fused == two, s"sample $i")
    }
  }

  test("bigramScore == driver-side stupid-backoff reference on random corpora") {
    for (i <- 0 until 3) {
      val rows = corpus(i, n = 30)
      val d = rows.toDF("doc_id", "text", "lang")
      val toks = rows.map { case (id, t, _) => id -> t.split(" ").toSeq }.toMap
      val uni = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val big = toks.values.filter(_.size >= 2)
        .flatMap(t => t.sliding(2).map(_.mkString(" ")))
        .groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val tot = toks.values.map(_.size).sum.toDouble
      val got = TextQueries.bigramScore(d).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val multi = toks.filter(_._2.size >= 2)
      assert(got.keySet == multi.keySet, "exactly the >=2-token docs are scored")
      for ((id, ts) <- multi) {
        val terms = ts.sliding(2).map { p =>
          val bg = p.mkString(" ")
          if (big.contains(bg)) -math.log(big(bg) / uni(p.head))
          else -math.log(0.4 * uni(p(1)) / tot)
        }.toSeq
        val want = BigDecimal(terms.sum / terms.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(id) == want, s"sample $i doc $id")
      }
    }
  }

  test("kneserNeyScore == driver-side interpolated-KN reference on random corpora") {
    for (i <- 0 until 3) {
      val rows = corpus(i, n = 30)
      val d = rows.toDF("doc_id", "text", "lang")
      val toks = rows.map { case (id, t, _) => id -> t.split(" ").toSeq }.toMap
      val D = 0.75
      val big = toks.values.filter(_.size >= 2)
        .flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
        .groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val lc = big.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val contL = big.keySet.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      val contR = big.keySet.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      val nTypes = big.size.toDouble
      val got = TextQueries.kneserNeyScore(d).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      for ((id, ts) <- toks if ts.size >= 2) {
        val terms = ts.sliding(2).map { p =>
          val v = math.max(big.getOrElse((p(0), p(1)), 0.0) - D, 0.0) / lc(p(0)) +
            D * contL(p(0)) / lc(p(0)) * (contR.getOrElse(p(1), 0.5) / nTypes)
          -math.log(v)
        }.toSeq
        val want = BigDecimal(terms.sum / terms.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(id) == want, s"sample $i doc $id")
      }
    }
  }

  test("heapsProfile: distinct-everywhere corpus reads beta exactly 1, saturated corpus exactly 0") {
    // every token globally unique → cv == ct at every boundary → the OLS
    // numerator and denominator are the same doubles → slope 1.0 exactly
    val uniq = (0 until 30).map(d =>
        (d.toLong, (0 until 5).map(j => s"w${d}_$j").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val r = TextQueries.heapsProfile(uniq).collect()(0)
    assert(r.getAs[Long]("total_tokens") == 150 && r.getAs[Long]("vocab_size") == 150)
    assert(r.getAs[Double]("heaps_beta") == 1.0)
    assert(math.abs(r.getAs[Double]("heaps_logk")) < 1e-9)
    // vocabulary saturates in doc 0 → constant cv → slope exactly 0
    val rep = (0 until 30).map(d => (d.toLong, "a b c a b c", "en"))
      .toDF("doc_id", "text", "lang")
    val r2 = TextQueries.heapsProfile(rep).collect()(0)
    assert(r2.getAs[Long]("vocab_size") == 3)
    assert(math.abs(r2.getAs[Double]("heaps_beta")) < 1e-9)
    // pure function of content: partitioning must not move the result
    val r3 = TextQueries.heapsProfile(uniq.repartition(7)).collect()(0)
    assert(r3 == r)
  }

  test("pmiCollocations == driver-side PMI reference on random corpora") {
    for (i <- 0 until 3) {
      val rows = corpus(i)
      val d = rows.toDF("doc_id", "text", "lang").repartition(5)
      val toks = rows.map(_._2.split(" ").toSeq)
      val n = toks.map(_.size).sum.toDouble
      val b = toks.map(t => math.max(t.size - 1, 0)).sum.toDouble
      val uni = toks.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toDouble }
      val bi = toks.flatMap(t => t.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
        .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      val want = bi.filter(_._2 >= 2).map { case ((w1, w2), c) =>
        val pmi = math.log((c.toDouble * n * n) / (b * uni(w1) * uni(w2)))
        (w1, w2) -> (c, BigDecimal(pmi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val got = TextQueries.pmiCollocations(d, minCount = 2L).collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(got == want, s"sample $i")
    }
  }

  test("editDistPairs: exact Levenshtein verdict over every winnow candidate") {
    val base = "the quick brown fox jumps over the lazy dog again and again and again"
    val rows = Seq(
      (0L, base, "en"),
      (1L, base, "en"),
      (2L, base.replace("quick", "slow"), "en"),
      (3L, "completely different content words entirely unrelated text here", "en"))
    val texts = rows.map(r => r._1 -> r._2).toMap
    def lev(a: String, b: String): Long = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (ii <- 1 to a.length) {
        var prev = dp(0); dp(0) = ii
        for (jj <- 1 to b.length) {
          val cur = dp(jj)
          dp(jj) = math.min(math.min(dp(jj) + 1, dp(jj - 1) + 1),
            prev + (if (a(ii - 1) == b(jj - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length).toLong
    }
    val d = rows.toDF("doc_id", "text", "lang")
    val got = TextQueries.editDistPairs(d, minSimPpm = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got.nonEmpty)
    got.foreach { case ((d1, d2), (dist, sim)) =>
      val (ta, tb) = (texts(d1), texts(d2))
      assert(dist == lev(ta, tb), s"($d1,$d2)")
      val ml = math.max(ta.length, tb.length).toLong
      assert(sim == (ml - dist) * 1000000L / ml, s"($d1,$d2)")
    }
    // the identical pair verifies at similarity 1.0; the one-word edit
    // survives; the threshold then cuts by sim_ppm exactly
    assert(got((0L, 1L)) == ((0L, 1000000L)))
    assert(got.contains((0L, 2L)) && got((0L, 2L))._1 > 0L)
    val strict = TextQueries.editDistPairs(d, minSimPpm = 999999L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == got.keySet.filter(k => got(k)._2 >= 999999L))
  }

  test("editDistAgainst: verified best matches agree with the winnow candidates + driver DP") {
    // template corpus: even docs are the corpus, odd docs the batch;
    // batch docs copy (or slightly edit) their even neighbor
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows = (0 until 20).map { i =>
      val t =
        if (i % 2 == 0) base + s" tail$i"
        else if (i % 4 == 1) base + s" tail${i - 1}"        // exact copy of i-1
        else base.replace("gamma", "gamme") + s" tail${i - 1}" // 1-char edit
      (i.toLong, t, "en")
    }
    val d = rows.toDF("doc_id", "text", "lang")
    val batch = d.filter($"doc_id" % 2 === 1)
    val corpus = d.filter($"doc_id" % 2 === 0)
    val cand = TextQueries.winnowDedupAgainst(batch, corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = TextQueries.editDistAgainst(batch, corpus, minSimPpm = 0L).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == cand.keySet, "verification must not add or drop candidates at sim>=0")
    val texts = rows.map(r => r._1 -> r._2).toMap
    def lev(a: String, b: String): Long = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (ii <- 1 to a.length) {
        var prev = dp(0); dp(0) = ii
        for (jj <- 1 to b.length) {
          val cur = dp(jj)
          dp(jj) = math.min(math.min(dp(jj) + 1, dp(jj - 1) + 1),
            prev + (if (a(ii - 1) == b(jj - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length).toLong
    }
    got.foreach { case (b, (c, dist, sim)) =>
      assert(c == cand(b), s"batch $b pairs with the winnow best match")
      assert(dist == lev(texts(b), texts(c)), s"batch $b")
      val ml = math.max(texts(b).length, texts(c).length).toLong
      assert(sim == (ml - dist) * 1000000L / ml)
    }
    assert(got.nonEmpty)
    // the threshold form is exactly the sim_ppm cut of the unfiltered run
    val thr = TextQueries.editDistAgainst(batch, corpus).collect()
      .map(r => r.getLong(0)).toSet
    assert(thr == got.filter(_._2._3 >= 500000L).keySet)
  }

  test("charClassProfile: classes partition every code point; bracket/tab fixtures exact") {
    val rows = Seq(
      (0L, "abc XYZ 123!", "en"),        // 6 letters, 3 digits, 2 spaces, 1 punct
      (1L, "[a-b]\t{c}~`", "en"),        // brackets/backtick/tilde are punct; tab is space
      (2L, "", "en"),                    // empty → all ppm 0
      (3L, "é世界 ok", "en")) // non-ASCII → other
    val d = rows.toDF("doc_id", "text", "lang")
    val got = TextQueries.charClassProfile(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    def ppm(c: Long, n: Long) = if (n == 0) 0L else c * 1000000L / n
    assert(got(0L) == ((12L, ppm(6, 12), ppm(3, 12), ppm(2, 12), ppm(1, 12), 0L)))
    assert(got(1L) == ((11L, ppm(3, 11), 0L, ppm(1, 11), ppm(7, 11), 0L)))
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(3L) == ((6L, ppm(2, 6), 0L, ppm(1, 6), 0L, ppm(3, 6))))
    // the partition invariant on random corpora: raw class counts sum
    // to the code-point count exactly (classes are disjoint singletons)
    for (i <- 0 until 3) {
      val c = corpus(i).toDF("doc_id", "text", "lang")
      val bad = TextQueries.charClassProfile(c)
        .filter(!(col("letter_ppm") + col("digit_ppm") + col("space_ppm") +
          col("punct_ppm") + col("other_ppm")).between(999996, 1000000) &&
          col("n_chars") > 0)
        .count()
      assert(bad == 0, s"sample $i: ppm shares must sum to ~1e6 (div truncation only)")
    }
  }

  test("vocabDrift: identical snapshots read exactly zero, shifts read positive and finite") {
    val a = (0 until 20).map(i => (i.toLong, "alpha beta gamma delta", "en"))
      .toDF("doc_id", "text", "lang")
    val r0 = TextQueries.vocabDrift(a, a).collect()(0)
    // p_new == p_old per term → ln(1) == 0.0 exactly, no tolerance needed
    assert(r0.getAs[Long]("kl_nano") == 0L)
    assert(r0.getAs[Long]("n_tokens_old") == 80L &&
      r0.getAs[Long]("n_tokens_new") == 80L && r0.getAs[Long]("vocab_old") == 4L)
    // disjoint vocabulary: positive, finite in BOTH directions (add-1
    // smoothing — unsmoothed KL would be infinite)
    val b = (0 until 20).map(i => (i.toLong, "zeta eta theta iota", "en"))
      .toDF("doc_id", "text", "lang")
    val r1 = TextQueries.vocabDrift(a, b).collect()(0)
    val r2 = TextQueries.vocabDrift(b, a).collect()(0)
    assert(r1.getAs[Long]("kl_nano") > 0L && r2.getAs[Long]("kl_nano") > 0L)
    // pure function of content: partitioning must not move a nano-unit
    val rp = TextQueries.vocabDrift(a.repartition(7), b.repartition(3)).collect()(0)
    assert(rp == r1)
  }

  test("readability: hand-counted fixture, vowel-less and unpunctuated floors") {
    val rows = Seq(
      (0L, "The cat sat. It ran away!", "en"), // 6 words, 2 sentences, 7 vowel runs
      (1L, "zzz zz", "en"),                    // no vowels, no punctuation → both floor to 1
      (2L, "why", "en"))                       // y is a vowel here: 1 run
    val d = rows.toDF("doc_id", "text", "lang")
    val got = TextQueries.readability(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)),
        (r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(0L)._1 == ((6L, 2L, 7L)))
    assert(got(1L)._1 == ((2L, 1L, 1L)))
    assert(got(2L)._1 == ((1L, 1L, 1L)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (_, ((w, s2, sy), (ease, grade))) =>
      assert(ease == r6(206.835 - 1.015 * (w.toDouble / s2) - 84.6 * (sy.toDouble / w)))
      assert(grade == r6(0.39 * (w.toDouble / s2) + 11.8 * (sy.toDouble / w) - 15.59))
    }
  }

  test("tokenEntropy: bounded by [0, ln n], zero iff one distinct token") {
    for (i <- 0 until 3) {
      val d = corpus(i).toDF("doc_id", "text", "lang")
      val docs = corpus(i).map { case (id, t, _) => id -> t.split(" ").toSeq }.toMap
      TextQueries.tokenEntropy(d).collect().foreach { r =>
        val (id, n, h) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        assert(n == docs(id).size)
        // H is quantized at 1e-6 half-up, so the upper bound can be
        // exceeded by up to half a quantum
        assert(h >= 0.0 && h <= math.log(n.toDouble) + 5e-7, s"doc $id: H=$h n=$n")
        assert((h == 0.0) == (docs(id).distinct.size == 1), s"doc $id")
      }
    }
  }
}
