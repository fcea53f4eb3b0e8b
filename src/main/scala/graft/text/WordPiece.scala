package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima 2012, "Japanese and
  * Korean voice search"; the BERT tokenizer of Devlin et al. 2019 §4.1)
  * — the third production tokenizer family next to
  * [[TextQueries.bpeTrain]] (BPE) and [[UnigramLm]] (unigram LM).
  *
  * == Training ==
  *
  * Identical mechanics to BPE — start from the character vocabulary,
  * repeatedly merge the best adjacent symbol pair, all non-overlapping
  * occurrences greedy left-to-right — but the selection criterion is the
  * LIKELIHOOD score `count(l,r) / (count(l) · count(r))` (the unigram-LM
  * likelihood gain of fusing the pair, the criterion the HuggingFace
  * `tokenizers` WordPiece trainer implements) instead of raw pair
  * frequency. Word-internal continuation is marked with the `##` prefix:
  * "word" seeds as `[w, ##o, ##r, ##d]` and merging `(l, r)` produces
  * `l + r` with r's `##` stripped, so a merged symbol keeps its
  * position class. The trained artifact is the VOCABULARY (alphabet +
  * merge products, first-production rank), not the merge table — encode
  * never replays merges.
  *
  * Scores are IEEE doubles in both train paths (the HF discipline); ties
  * break (score desc, l asc, r asc) so training is deterministic.
  *
  * == Encoding ==
  *
  * Greedy longest-match-first ("maximum munch"): at each position take
  * the longest vocabulary entry (with `##` applied when not word-
  * initial); if no entry matches at some position — or the word exceeds
  * `maxInputChars` — the WHOLE word becomes `[UNK]` (the BERT
  * `WordpieceTokenizer` contract). Per-word work is linear in
  * `len × maxSpan`.
  *
  * == Scale shape (100 TB) ==
  *
  * The corpus contributes exactly ONE pass — the distinct-word frequency
  * aggregate (Heaps-bounded, like the sibling trainers). When the
  * vocabulary fits `maxDriverVocab` it collects once and the merge loop
  * runs driver-side with INCREMENTAL pair/symbol statistics (each merge
  * rewrites only the words containing the pair, via the same
  * occurrence index as the BPE driver loop); the per-round argmax is a
  * full scan of the pair-stats map — unlike BPE's frequency heap, the
  * WordPiece score of EVERY pair containing symbol `s` moves whenever
  * any merge changes `count(s)`, so a lazy-deletion heap would serve
  * stale maxima; the scan is O(|distinct pairs|) driver memory traffic
  * per merge, zero Spark jobs. Beyond the bound, the distributed
  * fallback runs one bounded vocab-sized job per round (pair counts +
  * symbol counts, score argmax via two broadcast joins), the
  * [[TextQueries.bpeTrainDistributed]] discipline; both paths produce
  * the identical vocabulary (spec-pinned).
  *
  * Encoding runs the greedy walk once per DISTINCT word as a pure
  * Catalyst higher-order-function loop (no UDF) over a precomputed
  * match-span array, and the encoded vocabulary BROADCASTS onto the
  * corpus's doc_id-clustered word fan-out — the corpus never shuffles
  * on the skewed word key ([[TextQueries.bpeEncode]] idiom). The walk
  * is substring equality and integer comparisons only, so the DuckDB
  * oracle replays it exactly from the trained vocabulary literals.
  */
object WordPiece {

  val UnkToken = "[UNK]"

  /** Strip the continuation prefix when fusing a right-hand symbol. */
  private def fuse(l: String, r: String): String =
    l + (if (r.startsWith("##")) r.substring(2) else r)

  /** Characters a symbol covers in the surface word (## is markup). */
  private[graft] def span(tok: String): Int =
    if (tok.startsWith("##")) tok.length - 2 else tok.length

  /** Seed symbol sequence of a word: first char bare, rest ##-prefixed. */
  private[graft] def seedSyms(w: String): Vector[String] =
    w.iterator.zipWithIndex.map { case (c, i) =>
      if (i == 0) c.toString else "##" + c
    }.toVector

  // -------------------------------------------------------------------
  // training
  // -------------------------------------------------------------------

  /** Train over `docs` (needs a `text` column): vocabulary of
    * (rank, token) — ranks 0..A-1 the sorted alphabet, then merge
    * products in merge order (a re-derived token keeps its first rank).
    * One corpus pass; driver loop when the distinct-word vocabulary
    * fits `maxDriverVocab`, the distributed per-round loop beyond that.
    */
  def train(docs: DataFrame, numMerges: Int = 30,
            maxDriverVocab: Long = 4000000L): Seq[(Int, String)] = {
    val vocab = TextQueries.wordFreqOf(docs)
      .filter(length(col("word")) >= 1)
      .localCheckpoint()
    if (vocab.count() <= maxDriverVocab)
      trainDriver(vocab.collect().map(r => (r.getString(0), r.getLong(1))), numMerges)
    else trainDistributed(vocab, numMerges)
  }

  /** In-memory merge loop: incremental pair/symbol stats (only words
    * containing the merged pair are rewritten), full-scan argmax per
    * round (see the scale note above for why not a heap). */
  private[graft] def trainDriver(vocab: Array[(String, Long)],
                                numMerges: Int): Seq[(Int, String)] = {
    import scala.collection.mutable
    val syms: Array[Vector[String]] = vocab.map { case (w, _) => seedSyms(w) }
    val freq: Array[Long] = vocab.map(_._2)
    val pairStats = mutable.HashMap.empty[(String, String), Long]
    val symStats = mutable.HashMap.empty[String, Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWord(wi: Int, sign: Long): Unit = {
      val s = syms(wi); val f = freq(wi) * sign
      var i = 0
      while (i < s.length) {
        val c = symStats.getOrElse(s(i), 0L) + f
        if (c == 0L) symStats.remove(s(i)) else symStats(s(i)) = c
        if (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          val pc = pairStats.getOrElse(p, 0L) + f
          if (pc == 0L) pairStats.remove(p) else pairStats(p) = pc
          if (sign > 0) where.getOrElseUpdate(p, mutable.Set.empty) += wi
          else where.get(p).foreach(_ -= wi)
        }
        i += 1
      }
    }
    syms.indices.foreach(addWord(_, 1L))
    val alphabet = symStats.keysIterator.toSeq.sorted
    val out = mutable.LinkedHashMap.empty[String, Int]
    alphabet.zipWithIndex.foreach { case (t, i) => out(t) = i }
    var rank = alphabet.size
    var made = 0
    while (made < numMerges && pairStats.nonEmpty) {
      // argmax by (score desc, l asc, r asc); strictly-greater replace +
      // lexicographic tie keeps the scan order-independent
      var best: ((String, String), Double) = (null, -1.0)
      pairStats.foreach { case (p @ (l, r), c) =>
        val sc = c.toDouble / (symStats(l).toDouble * symStats(r).toDouble)
        if (sc > best._2 || (sc == best._2 &&
            (best._1 == null || l < best._1._1 ||
             (l == best._1._1 && r < best._1._2))))
          best = (p, sc)
      }
      val (l, r) = best._1
      val merged = fuse(l, r)
      where.getOrElse((l, r), mutable.Set.empty).toArray.sorted.foreach { wi =>
        addWord(wi, -1L)
        val s = syms(wi)
        val b = Vector.newBuilder[String]
        var j = 0
        while (j < s.length) {
          if (j < s.length - 1 && s(j) == l && s(j + 1) == r) { b += merged; j += 2 }
          else { b += s(j); j += 1 }
        }
        syms(wi) = b.result()
        addWord(wi, 1L)
      }
      if (!out.contains(merged)) { out(merged) = rank; rank += 1 }
      made += 1
    }
    out.toSeq.map { case (t, rk) => (rk, t) }
  }

  /** The distributed path on a docs frame — exposed for the parity
    * spec only. */
  private[graft] def trainDistributedOf(docs: DataFrame,
                                        numMerges: Int): Seq[(Int, String)] =
    trainDistributed(
      TextQueries.wordFreqOf(docs).filter(length(col("word")) >= 1).localCheckpoint(),
      numMerges)

  /** Distributed per-round loop — the overflow path. Each round: ONE
    * vocab-sized pair-count aggregate, a bounded symbol-count aggregate
    * (|alphabet| + merges rows, broadcast into the score join), one
    * collected argmax row; `localCheckpoint` truncates lineage per
    * round ([[TextQueries.bpeTrainDistributed]] discipline). */
  private[graft] def trainDistributed(vocab: DataFrame,
                                     numMerges: Int): Seq[(Int, String)] = {
    var words = vocab
      .withColumn("syms", expr(
        """transform(sequence(1, length(word)),
          |  i -> CASE WHEN i = 1 THEN substring(word, 1, 1)
          |            ELSE concat('##', substring(word, i, 1)) END)""".stripMargin))
      .select("syms", "freq")
      .localCheckpoint()
    val alphabet = words
      .select(explode(col("syms")).as("sym")).distinct()
      .collect().map(_.getString(0)).sorted
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    alphabet.zipWithIndex.foreach { case (t, i) => out(t) = i }
    var rank = alphabet.length
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      val symCnt = words
        .select(col("freq"), explode(col("syms")).as("sym"))
        .groupBy("sym").agg(sum("freq").as("sc"))
      val top = words
        .select(col("freq"), explode(expr(
          "transform(slice(syms, 1, greatest(size(syms) - 1, 0)), (s, i) -> struct(s AS l, element_at(syms, i + 2) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .join(broadcast(symCnt.select(col("sym").as("l"), col("sc").as("cl"))), Seq("l"))
        .join(broadcast(symCnt.select(col("sym").as("r"), col("sc").as("cr"))), Seq("r"))
        .select(col("l"), col("r"),
          (col("cnt").cast("double") /
            (col("cl").cast("double") * col("cr").cast("double"))).as("score"))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        val merged = fuse(l, r)
        val (ql, qr, qm) = (sqlLit(l), sqlLit(r), sqlLit(merged))
        words = words.withColumn("syms", expr(
          s"""aggregate(
             |  sequence(1, size(syms)),
             |  named_struct('out', CAST(array() AS ARRAY<STRING>), 'skip', false),
             |  (st, i) -> CASE
             |    WHEN st.skip THEN named_struct('out', st.out, 'skip', false)
             |    WHEN i < size(syms) AND element_at(syms, i) = '$ql'
             |         AND element_at(syms, i + 1) = '$qr'
             |      THEN named_struct('out', concat(st.out, array('$qm')), 'skip', true)
             |    ELSE named_struct('out', concat(st.out, array(element_at(syms, i))), 'skip', false)
             |  END,
             |  st -> st.out)""".stripMargin)).localCheckpoint()
        if (!out.contains(merged)) { out(merged) = rank; rank += 1 }
        made += 1
      }
    }
    out.toSeq.map { case (t, rk) => (rk, t) }
  }

  private def sqlLit(s: String): String = s.replace("'", "''")

  // -------------------------------------------------------------------
  // encoding
  // -------------------------------------------------------------------

  /** Driver reference greedy longest-match (the spec pin for the expr
    * walk). */
  private[graft] def encodeWordDriver(w: String, vocab: Set[String],
                                     maxInputChars: Int = 100): Seq[String] = {
    if (w.length > maxInputChars) return Seq(UnkToken)
    val acc = Vector.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      var e = w.length
      var hit: String = null
      while (hit == null && e > pos) {
        val cand = (if (pos == 0) "" else "##") + w.substring(pos, e)
        if (vocab.contains(cand)) hit = cand else e -= 1
      }
      if (hit == null) return Seq(UnkToken)
      acc += hit
      pos = e
    }
    acc.result()
  }

  /** (word, edges) frame: edges = sorted array<struct<e,s>> of vocab
    * match spans under the ## convention; words with no match anywhere
    * keep an empty array. `maxSpan` bounds the span enumeration. */
  private def edgesFrame(words: DataFrame, vocabDF: DataFrame,
                         maxSpan: Int): DataFrame = {
    val spans = words
      .select(col("word"), explode(expr(
        s"""flatten(transform(sequence(0, length(word) - 1),
           |  s -> transform(sequence(s + 1, least(s + $maxSpan, length(word))),
           |    e -> named_struct('s', s, 'e', e))))""".stripMargin)).as("se"))
      .select(col("word"), col("se.s").as("s"), col("se.e").as("e"),
        expr("""CASE WHEN se.s = 0 THEN substring(word, 1, se.e)
               |     ELSE concat('##', substring(word, se.s + 1, se.e - se.s)) END""".stripMargin)
          .as("piece"))
    val found = spans
      .join(broadcast(vocabDF), Seq("piece"))
      .groupBy("word")
      .agg(array_sort(collect_list(struct(col("e"), col("s")))).as("edges"))
    // both sides are vocabulary-sized; the broadcast hint keeps the
    // aggregate's opaque size estimate from degrading this to an SMJ
    // (the encoded vocab broadcasts downstream anyway — same budget)
    words.join(broadcast(found), Seq("word"), "left")
      .select(col("word"), coalesce(col("edges"),
        expr("cast(array() as array<struct<e:int,s:int>>)")).as("edges"))
  }

  /** The greedy walk as one Catalyst aggregate: state (pos, ps, bad);
    * each step takes the longest edge starting at pos (argmax e), or
    * fails the whole word to [UNK]. At most length(word) steps — every
    * successful step advances pos by >= 1. */
  private def walkExpr(maxInputChars: Int): String =
    s"""CASE WHEN length(word) > $maxInputChars THEN array('$UnkToken') ELSE
       |aggregate(
       |  sequence(1, length(word)),
       |  named_struct('pos', 0, 'ps', CAST(array() AS ARRAY<STRING>), 'bad', false),
       |  (st, ignored) -> CASE
       |    WHEN st.bad OR st.pos >= length(word) THEN st
       |    ELSE element_at(transform(
       |      array(aggregate(filter(edges, x -> x.s = st.pos), -1,
       |            (m, x) -> greatest(m, x.e))),
       |      be -> CASE WHEN be = -1
       |        THEN named_struct('pos', length(word),
       |               'ps', array('$UnkToken'), 'bad', true)
       |        ELSE named_struct('pos', be,
       |               'ps', concat(st.ps, array(CASE WHEN st.pos = 0
       |                 THEN substring(word, 1, be)
       |                 ELSE concat('##', substring(word, st.pos + 1, be - st.pos)) END)),
       |               'bad', false) END), 1)
       |  END,
       |  st -> st.ps)
       |END""".stripMargin

  /** Segment every document with a trained vocabulary: per-document
    * (n_words, n_tokens, stream_hash) — the [[TextQueries.bpeEncode]]
    * output contract (stream_hash = md5 of the space-joined token
    * stream in word order). */
  def encode(docs: DataFrame, vocab: Seq[(Int, String)],
             maxInputChars: Int = 100): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens = vocab.map(_._2)
    val maxSpan = math.max(1, tokens.map(span).max)
    val vocabDF = tokens.sorted.toDF("piece")
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .distinct()
    val encoded = edgesFrame(words, vocabDF, maxSpan)
      .withColumn("ps", expr(walkExpr(maxInputChars)))
      .select("word", "ps")
    docs.repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .join(broadcast(encoded), Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(size(col("ps"))).as("n_tokens"),
        md5(concat_ws(" ", flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("ps")))),
          s => s.getField("ps"))))).as("stream_hash"))
  }

  // -------------------------------------------------------------------
  // oracle
  // -------------------------------------------------------------------

  /** Vocabulary learned by the `wordpiece_encode` query, cached so the
    * oracle can embed token literals (the [[TextQueries.cachedMerges]]
    * pattern). */
  @volatile private[graft] var cachedVocab: Option[Seq[(Int, String)]] = None

  /** DuckDB twin of [[encode]]: replays the greedy longest-match walk
    * from the trained vocabulary LITERALS as a recursive CTE — substring
    * equality and integer max only, so parity is exact. */
  def encodeOracleSql(vocab: Seq[(Int, String)], maxInputChars: Int = 100): String = {
    def q(s: String) = s.replace("'", "''")
    val tokens = vocab.map(_._2)
    val maxSpan = math.max(1, tokens.map(span).max)
    val vals = tokens.sorted.map(t => s"('${q(t)}')").mkString(",\n    ")
    s"""WITH RECURSIVE
       |vocab(piece) AS (VALUES
       |    $vals),
       |w0 AS (SELECT doc_id, i AS pos, toks[i] AS word
       |       FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |            LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i)),
       |v AS (SELECT DISTINCT word FROM w0 WHERE length(word) >= 1),
       |sp AS (SELECT word, s, e,
       |         CASE WHEN s = 0 THEN substr(word, 1, CAST(e AS INT))
       |              ELSE '##' || substr(word, CAST(s + 1 AS INT), CAST(e - s AS INT)) END AS sub
       |       FROM v, LATERAL (SELECT unnest(range(0, length(word))) AS s),
       |            LATERAL (SELECT unnest(range(s + 1, least(s + $maxSpan, length(word)) + 1)) AS e)),
       |ed AS (SELECT word, list({'e': e, 's': s} ORDER BY e, s) AS edges
       |       FROM sp JOIN vocab ON sub = piece GROUP BY word),
       |wv AS (SELECT v.word, length(v.word) AS n,
       |              coalesce(ed.edges, CAST([] AS STRUCT(e BIGINT, s BIGINT)[])) AS edges
       |       FROM v LEFT JOIN ed USING (word)),
       |gw AS (
       |  SELECT word, n, edges, CAST(0 AS BIGINT) AS cpos,
       |         CAST([] AS VARCHAR[]) AS ps, (n > $maxInputChars) AS bad
       |  FROM wv
       |  UNION ALL
       |  SELECT word, n, edges,
       |    CASE WHEN be = -1 THEN n ELSE be END,
       |    CASE WHEN be = -1 THEN ['$UnkToken']
       |         WHEN cpos = 0 THEN list_append(ps, substr(word, 1, CAST(be AS INT)))
       |         ELSE list_append(ps, '##' || substr(word, CAST(cpos + 1 AS INT), CAST(be - cpos AS INT))) END,
       |    (be = -1)
       |  FROM gw, LATERAL (SELECT list_reduce(
       |      list_prepend(CAST(-1 AS BIGINT),
       |        list_transform(list_filter(edges, x -> x.s = cpos), x -> x.e)),
       |      (a, x) -> greatest(a, x)) AS be)
       |  WHERE cpos < n AND NOT bad),
       |fin AS (SELECT word, CASE WHEN bad THEN ['$UnkToken'] ELSE ps END AS ps
       |        FROM gw WHERE cpos >= n OR bad),
       |enc AS (SELECT word, array_to_string(ps, ' ') AS encoded, len(ps) AS n_pieces
       |        FROM fin)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_pieces) AS BIGINT) AS n_tokens,
       |  md5(string_agg(encoded, ' ' ORDER BY pos)) AS stream_hash
       |FROM w0 JOIN enc USING (word)
       |GROUP BY doc_id""".stripMargin
  }
}
