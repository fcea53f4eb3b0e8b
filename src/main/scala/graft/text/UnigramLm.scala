package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the SentencePiece `--model_type=unigram` algorithm), the other half
  * of the production tokenizer family next to [[TextQueries.bpeTrain]]:
  * a piece inventory with log-probabilities, trained by EM over the
  * segmentation lattice and applied by Viterbi decoding.
  *
  * == Training (EM + prune) ==
  *
  * Seed = every substring of the distinct-word vocabulary up to
  * `maxPieceLen` chars, scored by freq-weighted occurrence count; the
  * top `seedSize` multi-char substrings plus ALL single characters
  * (characters are never pruned — they guarantee every word stays
  * segmentable). Each round runs `emIters` EM steps — the E step is
  * the standard forward-backward over each word's segmentation lattice,
  * the M step renormalizes expected piece counts — then prunes the
  * lowest-count multi-char pieces by `shrink` until the inventory fits
  * `vocabSize` (Kudo §3.2 prunes by likelihood loss; expected-count
  * pruning is the common reimplementation simplification and is what
  * this trainer documents and pins).
  *
  * == Determinism (the property every artifact pin hangs off) ==
  *
  * Expected counts are QUANTIZED to integer micro-units
  * (`round(freq × microUnit × posterior)` per lattice edge) and summed
  * as longs — exact, associative arithmetic, so the trained table is
  * bit-identical under any partitioning, any vocab collect order, and
  * across the driver/distributed paths (spec-pinned). Within-word
  * float work (max-shifted log-sum-exp in lattice order) is
  * single-threaded and identically ordered in both paths. The unit
  * bounds total corpus tokens at ~2^63/microUnit (≈9×10^12 at the
  * 1e6 default — lower `microUnit` to trade posterior resolution for
  * headroom beyond that).
  *
  * == Scale shape (100 TB) ==
  *
  * The corpus contributes exactly ONE pass (the distinct-word
  * frequency aggregate, Heaps-bounded like [[TextQueries.bpeTrain]]).
  * When the vocabulary fits `maxDriverVocab` it collects once and EM
  * runs in memory — zero Spark jobs per step. The overflow path keeps
  * the vocabulary distributed: each EM step is ONE vocab-sized job
  * whose output is the piece-count table, bounded at `seedSize` rows
  * by construction, collected per step (the bounded
  * collect-per-round discipline of [[graft.ops.Components]]).
  *
  * Encoding applies Viterbi to the DISTINCT-WORD vocabulary — as a
  * pure Catalyst higher-order-function DP, no UDF — and broadcasts
  * the encoded vocabulary onto the corpus's doc_id-clustered word
  * fan-out (the [[TextQueries.bpeEncode]] idiom: the corpus never
  * shuffles on the skewed word key). Viterbi is additions and
  * comparisons of trained log-prob literals only — no transcendentals
  * — so the DuckDB oracle re-derives the segmentation from the same
  * literals with exact cross-engine parity.
  */
object UnigramLm {

  /** Log-prob charged per character when no trained piece covers a
    * position (unseen characters at encode time). Far below any real
    * piece's log-prob, so it is only ever chosen when nothing else
    * reaches the position. */
  val UnkLogp: Double = -100.0

  /** A trained inventory: (piece, logp), logp = ln(count/total) under
    * the final M step. */
  type Pieces = Seq[(String, Double)]

  // -------------------------------------------------------------------
  // shared lattice enumeration (driver and expr paths must mirror)
  // -------------------------------------------------------------------

  /** All (start, end, piece) spans of `word` up to `maxPieceLen`,
    * restricted to `pieces`, sorted by (end, start) — the ONE edge
    * order both DP directions and both train paths iterate in. */
  private def edgesDriver(word: String, pieces: collection.Map[String, Double],
                          maxPieceLen: Int): IndexedSeq[(Int, Int, Double)] = {
    val b = IndexedSeq.newBuilder[(Int, Int, Double)]
    for (e <- 1 to word.length; s <- math.max(0, e - maxPieceLen) until e) {
      val sub = word.substring(s, e)
      pieces.get(sub).foreach(lp => b += ((s, e, lp)))
    }
    b.result() // built in (e, s) order
  }

  /** Max-shifted log-sum-exp over `vals` IN ORDER (summation order is
    * part of the cross-path determinism contract). */
  private def lse(vals: Seq[Double]): Double = {
    val m = vals.max
    m + math.log(vals.foldLeft(0.0)((a, v) => a + math.exp(v - m)))
  }

  /** Spark's round(double) semantics exactly (BigDecimal.valueOf +
    * HALF_UP), so driver-side EM matches the distributed expr bit for
    * bit. */
  private def microRound(x: Double): Long =
    java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  // -------------------------------------------------------------------
  // driver-side EM (the fits-in-memory fast path)
  // -------------------------------------------------------------------

  /** One E step over the collected vocabulary: expected piece counts in
    * exact micro-units. `probs` maps piece -> logp. */
  private def eStepDriver(vocab: Array[(String, Long)],
                          probs: collection.Map[String, Double],
                          maxPieceLen: Int, microUnit: Long): collection.mutable.Map[String, Long] = {
    val counts = collection.mutable.Map.empty[String, Long]
    for ((word, freq) <- vocab) {
      val n = word.length
      val edges = edgesDriver(word, probs, maxPieceLen)
      // forward: alpha(i) = lse over edges ending at i (s ascending)
      val alpha = new Array[Double](n + 1)
      for (i <- 1 to n) {
        val vals = edges.collect { case (s, e, lp) if e == i => alpha(s) + lp }
        alpha(i) = lse(vals) // chars always present -> nonempty
      }
      // backward: beta(j) = lse over edges starting at j (e ascending)
      val beta = new Array[Double](n + 1)
      for (j <- n - 1 to 0 by -1) {
        val vals = edges.collect { case (s, e, lp) if s == j => lp + beta(e) }
        beta(j) = lse(vals)
      }
      for ((s, e, lp) <- edges) {
        val post = math.exp(alpha(s) + lp + beta(e) - alpha(n))
        val mc = microRound(freq.toDouble * microUnit.toDouble * post)
        if (mc != 0L) {
          val sub = word.substring(s, e)
          counts(sub) = counts.getOrElse(sub, 0L) + mc
        }
      }
    }
    counts
  }

  /** Renormalize micro-counts into log-probs; single characters floor
    * at one unit so every word stays segmentable. */
  private def mStep(counts: collection.Map[String, Long],
                    pieceSet: Iterable[String]): Map[String, Double] = {
    val floored = pieceSet.map { p =>
      val c = counts.getOrElse(p, 0L)
      p -> (if (p.length == 1 && c == 0L) 1L else c)
    }.filter(_._2 > 0L).toMap
    val total = floored.values.sum.toDouble
    floored.map { case (p, c) => p -> math.log(c.toDouble / total) }
  }

  /** Prune the lowest-count multi-char pieces: keep all single chars
    * plus the top `keepMulti` multis by (count desc, piece asc). */
  private def prune(counts: collection.Map[String, Long],
                    pieces: Iterable[String], keepMulti: Int): Set[String] = {
    val (chars, multis) = pieces.partition(_.length == 1)
    val kept = multis.toSeq
      .map(p => (p, counts.getOrElse(p, 0L)))
      .sortBy { case (p, c) => (-c, p) }
      .take(keepMulti).map(_._1)
    chars.toSet ++ kept
  }

  private def trainDriver(vocab: Array[(String, Long)], vocabSize: Int,
                          maxPieceLen: Int, seedSize: Int, shrink: Double,
                          emIters: Int, microUnit: Long): Pieces = {
    // seed: exact freq-weighted substring counts
    val seedCounts = collection.mutable.Map.empty[String, Long]
    for ((word, freq) <- vocab; e <- 1 to word.length;
         s <- math.max(0, e - maxPieceLen) until e) {
      val sub = word.substring(s, e)
      seedCounts(sub) = seedCounts.getOrElse(sub, 0L) + freq
    }
    val chars = seedCounts.keysIterator.filter(_.length == 1).toSet
    val topMulti = seedCounts.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedSize - chars.size)).map(_._1)
    var pieceSet: Set[String] = chars ++ topMulti
    var probs: Map[String, Double] = mStep(seedCounts, pieceSet)
    var done = false
    while (!done) {
      var lastCounts: collection.Map[String, Long] = null
      for (_ <- 1 to emIters) {
        lastCounts = eStepDriver(vocab, probs, maxPieceLen, microUnit)
        probs = mStep(lastCounts, pieceSet)
        pieceSet = probs.keySet
      }
      val nMulti = pieceSet.count(_.length > 1)
      val target = math.max(vocabSize - chars.size, (nMulti * shrink).toInt)
      // chars alone can exceed vocabSize (they are never pruned): stop
      // once no multi-char piece remains to shrink
      if (nMulti == 0 || chars.size + nMulti <= vocabSize) done = true
      else {
        pieceSet = prune(lastCounts, pieceSet, math.min(target, nMulti - 1))
        probs = mStep(lastCounts, pieceSet)
        pieceSet = probs.keySet
      }
    }
    val fin = eStepDriver(vocab, probs, maxPieceLen, microUnit)
    mStep(fin, pieceSet).toSeq.sortBy(_._1)
  }

  // -------------------------------------------------------------------
  // expression builders (distributed E step + Viterbi encode)
  // -------------------------------------------------------------------

  /** (word, edges) frame: edges = sorted array<struct<e,s,lp>> of the
    * word's lattice under `pieces` (piece, lp). Words whose characters
    * all miss `pieces` keep an empty edge array. */
  private def edgesFrame(words: DataFrame, pieces: DataFrame,
                         maxPieceLen: Int): DataFrame = {
    val spans = words
      .select(col("word"), explode(expr(
        s"""flatten(transform(sequence(0, length(word) - 1),
           |  s -> transform(sequence(s + 1, least(s + $maxPieceLen, length(word))),
           |    e -> named_struct('s', s, 'e', e))))""".stripMargin)).as("se"))
      .select(col("word"), col("se.s").as("s"), col("se.e").as("e"),
        expr("substring(word, se.s + 1, se.e - se.s)").as("piece"))
    val found = spans
      .join(broadcast(pieces), Seq("piece"))
      .groupBy("word")
      .agg(array_sort(collect_list(
        struct(col("e"), col("s"), col("lp")))).as("edges"))
    words.join(found, Seq("word"), "left")
      .select(col("word"), coalesce(col("edges"),
        expr("cast(array() as array<struct<e:int,s:int,lp:double>>)")).as("edges"))
  }

  /** Forward log-partition array alpha(0..n) as a Catalyst DP — the
    * exact expr twin of the driver loop (same edge order, same
    * max-shifted in-order summation). Null when some position is
    * unreachable (never in training: chars are retained). */
  private val alphaExpr: String =
    """aggregate(
      |  sequence(1, length(word)), array(0.0D),
      |  (acc, i) -> element_at(transform(
      |    array(transform(filter(edges, x -> x.e = i),
      |          x -> element_at(acc, x.s + 1) + x.lp)),
      |    vals -> concat(acc, array(element_at(
      |      transform(array(array_max(vals)),
      |        m -> m + ln(aggregate(vals, 0.0D, (a2, v) -> a2 + exp(v - m)))),
      |      1)))), 1))""".stripMargin

  /** Reversed backward array: rbeta(t) = beta(n - t + 1) for t = 1..n+1
    * (so beta(e) = element_at(rbeta, n - e + 1)); same lse discipline,
    * edges starting at j iterated e-ascending. */
  private val rbetaExpr: String =
    """aggregate(
      |  sequence(1, length(word)), array(0.0D),
      |  (acc, t) -> element_at(transform(
      |    array(transform(filter(edges, x -> x.s = length(word) - t),
      |          x -> x.lp + element_at(acc, length(word) - x.e + 1))),
      |    vals -> concat(acc, array(element_at(
      |      transform(array(array_max(vals)),
      |        m -> m + ln(aggregate(vals, 0.0D, (a2, v) -> a2 + exp(v - m)))),
      |      1)))), 1))""".stripMargin

  /** Per-edge expected micro-counts array<struct<piece,mc>> given
    * bound columns `word`, `freq`, `edges`, `alpha`, `rbeta`. */
  private def microCountsExpr(microUnit: Long): String =
    s"""transform(edges, x -> named_struct(
       |  'piece', substring(word, x.s + 1, x.e - x.s),
       |  'mc', cast(round(cast(freq as double) * ${microUnit}.0D *
       |    exp(element_at(alpha, x.s + 1) + x.lp +
       |        element_at(rbeta, length(word) - x.e + 1) -
       |        element_at(alpha, length(word) + 1))) as long)))""".stripMargin

  /** One distributed E step: expected micro-counts per piece —
    * ONE vocab-sized job whose output is bounded by the piece
    * inventory. */
  private def eStepDistributed(vocabDF: DataFrame, probs: Map[String, Double],
                               maxPieceLen: Int, microUnit: Long): Map[String, Long] = {
    val spark = vocabDF.sparkSession
    import spark.implicits._
    val piecesDF = probs.toSeq.sortBy(_._1).toDF("piece", "lp")
    edgesFrame(vocabDF.select(col("word")), piecesDF, maxPieceLen)
      .join(vocabDF, Seq("word"))
      .withColumn("alpha", expr(alphaExpr))
      .withColumn("rbeta", expr(rbetaExpr))
      .select(explode(expr(microCountsExpr(microUnit))).as("pm"))
      .groupBy(col("pm.piece").as("piece"))
      .agg(sum(col("pm.mc")).as("mc"))
      .filter(col("mc") =!= 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def trainDistributedLoop(vocabDF: DataFrame, vocabSize: Int,
                                   maxPieceLen: Int, seedSize: Int, shrink: Double,
                                   emIters: Int, microUnit: Long): Pieces = {
    // distributed seed: freq-weighted substring counts; single chars all
    // kept, multis top-K via distributed TakeOrdered
    val spans = vocabDF.select(col("word"), col("freq"),
      explode(expr(
        s"""flatten(transform(sequence(0, length(word) - 1),
           |  s -> transform(sequence(s + 1, least(s + $maxPieceLen, length(word))),
           |    e -> substring(word, s + 1, e - s))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
      .localCheckpoint()
    val chars = spans.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multis = spans.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(math.max(0, seedSize - chars.length))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val seedCounts = (chars ++ multis).toMap
    var pieceSet: Set[String] = seedCounts.keySet
    var probs: Map[String, Double] = mStep(seedCounts, pieceSet)
    var done = false
    val nChars = chars.length
    while (!done) {
      var lastCounts: collection.Map[String, Long] = null
      for (_ <- 1 to emIters) {
        lastCounts = eStepDistributed(vocabDF, probs, maxPieceLen, microUnit)
        probs = mStep(lastCounts, pieceSet)
        pieceSet = probs.keySet
      }
      val nMulti = pieceSet.count(_.length > 1)
      val target = math.max(vocabSize - nChars, (nMulti * shrink).toInt)
      if (nMulti == 0 || nChars + nMulti <= vocabSize) done = true
      else {
        pieceSet = prune(lastCounts, pieceSet, math.min(target, nMulti - 1))
        probs = mStep(lastCounts, pieceSet)
        pieceSet = probs.keySet
      }
    }
    val fin = eStepDistributed(vocabDF, probs, maxPieceLen, microUnit)
    mStep(fin, pieceSet).toSeq.sortBy(_._1)
  }

  // -------------------------------------------------------------------
  // public train / encode
  // -------------------------------------------------------------------

  /** Train the unigram inventory over `docs` (needs a `text` column).
    * One corpus pass; driver EM when the distinct-word vocabulary fits
    * `maxDriverVocab`, the distributed per-step loop beyond that —
    * both paths produce the identical table (spec-pinned). */
  def train(docs: DataFrame, vocabSize: Int = 96, maxPieceLen: Int = 6,
            seedSize: Int = 512, shrink: Double = 0.8, emIters: Int = 2,
            microUnit: Long = 1000000L,
            maxDriverVocab: Long = 4000000L): Pieces = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      s"need seedSize >= vocabSize >= 1, got vocab=$vocabSize seed=$seedSize")
    require(maxPieceLen >= 1 && shrink > 0 && shrink < 1 && emIters >= 1)
    val vocab = TextQueries.wordFreqOf(docs)
      .filter(length(col("word")) >= 1)
      .localCheckpoint()
    if (vocab.count() <= maxDriverVocab)
      trainDriver(vocab.collect().map(r => (r.getString(0), r.getLong(1))),
        vocabSize, maxPieceLen, seedSize, shrink, emIters, microUnit)
    else trainDistributedLoop(vocab, vocabSize, maxPieceLen, seedSize,
      shrink, emIters, microUnit)
  }

  /** The distributed path on the SAME collected-scale vocab — exposed
    * for the parity spec only. */
  private[graft] def trainDistributed(docs: DataFrame, vocabSize: Int = 96,
                                     maxPieceLen: Int = 6, seedSize: Int = 512,
                                     shrink: Double = 0.8, emIters: Int = 2,
                                     microUnit: Long = 1000000L): Pieces =
    trainDistributedLoop(
      TextQueries.wordFreqOf(docs).filter(length(col("word")) >= 1).localCheckpoint(),
      vocabSize, maxPieceLen, seedSize, shrink, emIters, microUnit)

  /** Driver-side reference Viterbi (spec pin for the expr DP): maximize
    * summed logp; candidates = the UNK single-char fallback first, then
    * edges ending at the position in s-ascending order, replacing only
    * on STRICTLY greater score — ties therefore prefer the earliest
    * candidate, i.e. the longest piece. */
  private[graft] def viterbiDriver(word: String,
                                  pieces: collection.Map[String, Double],
                                  maxPieceLen: Int): Seq[String] = {
    val n = word.length
    val edges = edgesDriver(word, pieces, maxPieceLen)
    val sc = new Array[Double](n + 1)
    val bp = new Array[Int](n + 1)
    bp(0) = -1
    for (i <- 1 to n) {
      var bestS = sc(i - 1) + UnkLogp
      var bestB = i - 1
      for ((s, e, lp) <- edges if e == i) {
        val v = sc(s) + lp
        if (v > bestS) { bestS = v; bestB = s }
      }
      sc(i) = bestS; bp(i) = bestB
    }
    var pos = n
    val acc = collection.mutable.ListBuffer.empty[String]
    while (pos > 0) { acc.prepend(word.substring(bp(pos), pos)); pos = bp(pos) }
    acc.toList
  }

  /** Viterbi DP as a Catalyst aggregate over (word, edges): scores +
    * backpointers, then an O(n) backtrace — additions and comparisons
    * of trained literals only, so DuckDB replays it bit-identically. */
  private val viterbiDpExpr: String =
    s"""aggregate(
       |  sequence(1, length(word)),
       |  named_struct('sc', array(0.0D), 'bp', array(-1)),
       |  (acc, i) -> element_at(transform(
       |    array(aggregate(
       |      filter(edges, x -> x.e = i),
       |      named_struct('sc1', element_at(acc.sc, i) + ${UnkLogp}D, 'bp1', i - 1),
       |      (a2, x) -> if(element_at(acc.sc, x.s + 1) + x.lp > a2.sc1,
       |                    named_struct('sc1', element_at(acc.sc, x.s + 1) + x.lp, 'bp1', x.s),
       |                    a2))),
       |    st -> named_struct(
       |      'sc', concat(acc.sc, array(st.sc1)),
       |      'bp', concat(acc.bp, array(st.bp1)))), 1))""".stripMargin

  private val backtraceExpr: String =
    """aggregate(
      |  sequence(1, length(word)),
      |  named_struct('pos', length(word), 'ps', cast(array() as array<string>)),
      |  (acc, ignored) -> if(acc.pos <= 0, acc,
      |    named_struct(
      |      'pos', element_at(dp.bp, acc.pos + 1),
      |      'ps', concat(array(substring(word, element_at(dp.bp, acc.pos + 1) + 1,
      |                   acc.pos - element_at(dp.bp, acc.pos + 1))), acc.ps))),
      |  acc -> acc.ps)""".stripMargin

  /** Segment every document with a trained inventory: per-document
    * (n_words, n_tokens, stream_hash), the [[TextQueries.bpeEncode]]
    * output contract (stream_hash = md5 of the space-joined piece
    * stream in word order).
    *
    * Scale shape: Viterbi runs once per DISTINCT word — a pure
    * higher-order-function DP over the (word, edges) frame, no UDF, no
    * driver loop — and the encoded vocabulary broadcasts onto the
    * corpus's doc_id-clustered word fan-out; the corpus never shuffles
    * on the word key. */
  def encode(docs: DataFrame, pieces: Pieces, maxPieceLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val piecesDF = pieces.toDF("piece", "lp")
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .distinct()
    val encoded = edgesFrame(words, piecesDF, maxPieceLen)
      .withColumn("dp", expr(viterbiDpExpr))
      .withColumn("syms", expr(backtraceExpr))
      .select("word", "syms")
    docs.repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .join(broadcast(encoded), Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(size(col("syms"))).as("n_tokens"),
        md5(concat_ws(" ", flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("syms")))),
          s => s.getField("syms"))))).as("stream_hash"))
  }

  // -------------------------------------------------------------------
  // oracle
  // -------------------------------------------------------------------

  /** Inventory learned by the `unigram_encode` query, cached so the
    * oracle can embed (piece, logp) literals — the
    * [[TextQueries.cachedMerges]] pattern. */
  @volatile private[text] var cachedPieces: Option[Pieces] = None

  /** DuckDB twin of [[encode]]: re-derives the Viterbi segmentation
    * from the trained (piece, logp) LITERALS — recursive-CTE DP with
    * the same candidate order (UNK init, then edges by (e, s)) and the
    * same strictly-greater replacement, all additions/comparisons of
    * identical double literals, so parity is exact, not approximate. */
  def encodeOracleSql(pieces: Pieces, maxPieceLen: Int): String = {
    def q(s: String) = s.replace("'", "''")
    val vals = pieces.sortBy(_._1)
      .map { case (p, lp) => s"('${q(p)}', CAST(${lp} AS DOUBLE))" }
      .mkString(",\n    ")
    s"""WITH RECURSIVE
       |pieces(piece, lp) AS (VALUES
       |    $vals),
       |w0 AS (SELECT doc_id, i AS pos, toks[i] AS word
       |       FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |            LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i)),
       |v AS (SELECT DISTINCT word FROM w0 WHERE length(word) >= 1),
       |sp AS (SELECT word, s, e, substr(word, CAST(s + 1 AS INT), CAST(e - s AS INT)) AS sub
       |       FROM v, LATERAL (SELECT unnest(range(0, length(word))) AS s),
       |            LATERAL (SELECT unnest(range(s + 1, least(s + $maxPieceLen, length(word)) + 1)) AS e)),
       |ed AS (SELECT word, list({'e': e, 's': s, 'lp': lp} ORDER BY e, s) AS edges
       |       FROM sp JOIN pieces ON sub = piece GROUP BY word),
       |wv AS (SELECT v.word, length(v.word) AS n,
       |              coalesce(ed.edges, CAST([] AS STRUCT(e BIGINT, s BIGINT, lp DOUBLE)[])) AS edges
       |       FROM v LEFT JOIN ed USING (word)),
       |dp AS (
       |  SELECT word, n, edges, 0 AS i, [CAST(0.0 AS DOUBLE)] AS sc, [CAST(-1 AS BIGINT)] AS bp
       |  FROM wv
       |  UNION ALL
       |  SELECT word, n, edges, i + 1, list_append(sc, st.sc1), list_append(bp, st.bp1)
       |  FROM dp, LATERAL (SELECT list_reduce(
       |      list_prepend({'sc1': sc[i + 1] + CAST(${UnkLogp} AS DOUBLE), 'bp1': CAST(i AS BIGINT)},
       |        list_transform(list_filter(edges, x -> x.e = i + 1),
       |          x -> {'sc1': sc[x.s + 1] + x.lp, 'bp1': x.s})),
       |      (a, x) -> CASE WHEN x.sc1 > a.sc1 THEN x ELSE a END) AS st)
       |  WHERE i < n),
       |fin AS (SELECT word, n, bp FROM dp WHERE i = n),
       |bt AS (
       |  SELECT word, n, bp, CAST(n AS BIGINT) AS bpos, CAST([] AS VARCHAR[]) AS ps FROM fin
       |  UNION ALL
       |  SELECT word, n, bp, bp[CAST(bpos + 1 AS INT)],
       |    list_prepend(substr(word, CAST(bp[CAST(bpos + 1 AS INT)] + 1 AS INT),
       |                        CAST(bpos - bp[CAST(bpos + 1 AS INT)] AS INT)), ps)
       |  FROM bt WHERE bpos > 0),
       |enc AS (SELECT word, array_to_string(ps, ' ') AS encoded, len(ps) AS n_pieces
       |        FROM bt WHERE bpos = 0)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_pieces) AS BIGINT) AS n_tokens,
       |  md5(string_agg(encoded, ' ' ORDER BY pos)) AS stream_hash
       |FROM w0 JOIN enc USING (word)
       |GROUP BY doc_id""".stripMargin
  }
}
