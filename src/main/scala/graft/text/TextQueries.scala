package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data-pipeline text operators over the `documents` table:
  * token/quality stats, language-ID heuristic, fingerprinting, exact
  * dedup, word-shingle MinHash + LSH candidate pairs + verified Jaccard,
  * SimHash. All pure Catalyst expressions (higher-order array functions),
  * no UDFs — everything stays codegen-friendly and scales by partition.
  *
  * Cross-engine portable hash: `h(s) = int64(md5_hex(s)[0,15), base 16)`
  * (15 hex digits < 2^60 fits a signed 64-bit int in both engines).
  *
  * Scale notes (100 TB): every op here is per-row or key-grouped —
  * shingle explosion is the only fan-out (×~n_tokens), and the LSH
  * band-join replaces the O(n²) all-pairs comparison with a
  * bucket-local equi-join, which is the standard web-scale dedup shape.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Portable 60-bit hash of a string expression. */
  private[text] def phash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private[text] def phashSql(c: String): String =
    s"CAST(concat('0x', substr(md5($c), 1, 15)) AS BIGINT)"

  // MinHash parameters: k permutations in b bands of r rows
  private val K = 16
  private val BANDS = 4
  private val P = 1073741789L // prime < 2^30
  private val H30 = 1073741824L // 2^30

  private val STOP = Seq("the", "a", "of", "and")

  /** SQL fragment producing the positional word-n-gram array from a
    * bound `toks` column — the ONE definition of gram construction the
    * n-gram operators share ([[topNgram]], [[scrubFrequentNgrams]],
    * [[bigramScore]], [[dsirBucketsExpr]]). Space-joined, order
    * preserved, (size - n + 1) grams. */
  private def ngramArrayExpr(n: Int): String = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val rest = (1 until n).map(j => s", toks[i + $j]").mkString
    s"transform(slice(toks, 1, greatest(size(toks) - ${n - 1}, 0)), (t, i) -> concat_ws(' ', t$rest))"
  }

  /** documents → (doc_id, shingle) distinct word-n-gram shingles. */
  private def ngramShingles(docs: DataFrame, n: Int): DataFrame = {
    val parts = (0 until n)
      .map(j => if (j == 0) "element_at(toks, i)" else s"element_at(toks, i + $j)")
      .mkString(", ")
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        expr(s"transform(sequence(1, size(toks) - ${n - 1}), i -> concat_ws(' ', $parts))")
      )).as("shingle"))
  }

  /** documents → (doc_id, shingle) distinct word-3-gram shingles (the
    * MinHash/LSH chain's unit). */
  private def shingles(docs: DataFrame): DataFrame = ngramShingles(docs, 3)

  /** BPE-ish pre-tokenizer alternation (GPT-2 shape: contraction
    * suffixes, space-prefixed letter runs, digit runs, symbol runs,
    * whitespace) with the lookahead dropped so the SAME pattern runs
    * identically under Java regex (Spark) and RE2 (DuckDB) — RE2 has
    * no lookahead, and both engines resolve alternation leftmost-first.
    */
  val BpeishPattern: String =
    """'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"""

  /** Whitespace token count of a text field. */
  def wsTokenCount(textField: String): Column =
    size(split(col(textField), " "))

  /** BPE-ish token count: matches of [[BpeishPattern]] — on plain-word
    * corpora it coincides with [[wsTokenCount]]; punctuation,
    * contractions, and digit runs split further, approximating subword
    * tokenizer budgets for data-sizing decisions. */
  def bpeishTokenCount(textField: String): Column =
    size(regexp_extract_all(col(textField), lit(BpeishPattern), lit(0)))

  /** Per-row distinct word-n-gram array over a text field — the
    * explode-free form of [[ngramShingles]] for streaming/stateless
    * consumers; empty array below n tokens. */
  def ngramShinglesExpr(textField: String, n: Int): Column = {
    val parts = (0 until n)
      .map(j => if (j == 0) "element_at(toks, i)" else s"element_at(toks, i + $j)")
      .mkString(", ")
    expr(
      s"""element_at(transform(array(split($textField, ' ')), toks ->
         |  CASE WHEN size(toks) >= $n THEN
         |    array_distinct(transform(sequence(1, size(toks) - ${n - 1}),
         |      i -> concat_ws(' ', $parts)))
         |  ELSE CAST(array() AS ARRAY<STRING>) END), 1)""".stripMargin)
  }

  /** DuckDB-oracle twin of [[ngramShingles]], over any source relation
    * (a table name or a parenthesized subquery) so the incremental-dedup
    * and decontamination oracles can shingle arbitrary splits. */
  private def ngramShinglesSqlFor(src: String, n: Int): String = {
    val parts = (0 until n)
      .map(j => if (j == 0) "toks[i]" else s"toks[i + $j]")
      .mkString(", ' ', ")
    s"""SELECT doc_id, unnest(list_distinct(
       |    list_transform(range(1, len(toks) - ${n - 2}),
       |      i -> concat($parts)))) AS shingle
       |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src)
       |WHERE len(toks) >= $n""".stripMargin
  }

  private def shinglesSqlFor(src: String): String = ngramShinglesSqlFor(src, 3)

  private val shinglesSql: String = shinglesSqlFor("documents")

  /** (doc_id, seed, minh): the MinHash signature, k rows per doc.
    *
    * One aggregation pass with K parallel `min` columns (then unpivoted
    * via `stack`) instead of a K-fold row explosion — at 100 TB the
    * explode variant would shuffle K× the shingle volume for no reason.
    */
  private def minhashSig(docs: DataFrame): DataFrame =
    minhashSigFromShingles(
      shingles(docs).select(col("doc_id"), phash(col("shingle")).as("h")))

  /** Wide signature frame (doc_id, m0..m15) from the compact
    * hashed-shingle frame (doc_id, h): the 30-bit minhash input is just
    * `h % 2^30`, and all K permutation minima come out of ONE
    * aggregation pass. */
  private def minhashWide(sh: DataFrame): DataFrame = {
    val hashed = sh.withColumn("h30", col("h") % lit(H30))
    val aggs = (0 until K).map { s =>
      min((col("h30") * lit(2L * s + 1) + lit(7919L * s)) % lit(P)).as(s"m$s")
    }
    hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  private def minhashSigFromShingles(sh: DataFrame): DataFrame = {
    val stackExpr = s"stack($K, " +
      (0 until K).map(s => s"$s, m$s").mkString(", ") + ") AS (seed, minh)"
    minhashWide(sh).select(col("doc_id"), expr(stackExpr))
  }

  private def minhashSigSqlFor(src: String): String =
    s"""SELECT doc_id, seed, min((h30 * (seed * 2 + 1) + seed * 7919) % $P) AS minh
       |FROM (SELECT doc_id, ${phashSql("shingle")} % $H30 AS h30
       |      FROM (${shinglesSqlFor(src)})) CROSS JOIN (SELECT unnest(range($K)) AS seed)
       |GROUP BY doc_id, seed""".stripMargin

  private val minhashSigSql: String = minhashSigSqlFor("documents")

  /** Band-signature oracle twin of [[bandSignatures]]. */
  private def bandsSqlFor(src: String): String =
    s"""SELECT doc_id, CAST(seed // ${K / BANDS} AS INT) AS band,
       |  string_agg(CAST(minh AS VARCHAR), ',' ORDER BY seed) AS sig
       |FROM (${minhashSigSqlFor(src)}) GROUP BY doc_id, band""".stripMargin

  /** Per-row LSH band-signature array over a text field — the SAME
    * K/BANDS/hash chain as [[minhashSig]], but computed entirely with
    * nested higher-order functions so it needs NO explode/groupBy: the
    * streaming dedup path ([[graft.streaming.StreamOps]]) keeps signature
    * computation stateless/per-row and leaves only the band-collision
    * lookup stateful. Docs with fewer than 3 tokens yield an empty array
    * (no shingles → no bands), matching the batch path.
    *
    * The token list and the per-shingle hashes are each bound ONCE as a
    * lambda variable (`transform(array(x), v -> ...)`): referencing a
    * computed column K times lets CollapseProject duplicate the md5 work
    * K-fold (the round-1 codegen blow-up lesson) — a lambda binding
    * gives the optimizer nothing to copy.
    */
  def bandSigsExpr(textField: String): Column = {
    val r = K / BANDS
    def minh(seed: String) =
      s"CAST(array_min(transform(hs, h -> (h * (2 * ($seed) + 1) + 7919 * ($seed)) % $P)) AS STRING)"
    val bandArr = s"transform(sequence(0, ${BANDS - 1}), b -> concat_ws(','," +
      (0 until r).map(k => minh(s"b * $r + $k")).mkString(", ") + "))"
    expr(
      s"""element_at(transform(array(split($textField, ' ')), toks ->
         |  CASE WHEN size(toks) >= 3 THEN
         |    element_at(transform(array(
         |        transform(array_distinct(transform(sequence(1, size(toks) - 2),
         |          i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))),
         |          x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT) % $H30)
         |      ), hs -> $bandArr), 1)
         |  ELSE CAST(array() AS ARRAY<STRING>) END), 1)""".stripMargin)
  }

  /** Per-row distinct shingle-hash set (full 60-bit portable hash, NOT
    * the 2^30-folded minhash input) — carried by the streaming LSH path
    * so candidate pairs can be exact-Jaccard-verified from state without
    * re-reading documents: |A∩B|/|A∪B| over 60-bit hashes equals the
    * shingle-string Jaccard up to a ~2⁻⁶⁰ collision probability. Empty
    * array below 3 tokens, same as [[bandSigsExpr]]. */
  def shingleHashesExpr(textField: String): Column = expr(
    s"""element_at(transform(array(split($textField, ' ')), toks ->
       |  CASE WHEN size(toks) >= 3 THEN
       |    array_distinct(transform(array_distinct(transform(sequence(1, size(toks) - 2),
       |      i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))),
       |      x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)))
       |  ELSE CAST(array() AS ARRAY<BIGINT>) END), 1)""".stripMargin)

  /** Full LSH dedup chain over any (doc_id, text) frame — the body of
    * the `dedup_lsh_pairs` query, public so `BenchLarge` can drive it at
    * synthetic-corpus scale. The shingle and band-signature lineages
    * feed multiple joins and are deliberately NOT persisted: re-deriving
    * the codegen'd tokenize+explode+agg chain per branch measured 2.0 s
    * steady-state at sf0.1 vs 5.4 s with MEMORY_AND_DISK persist (the
    * columnar cache build costs more than the recompute), and at corpus
    * scale materializing a multi-TB intermediate is strictly worse than
    * re-scanning the pruned source columns. */
  def lshPairs(docs: DataFrame, threshold: Double = 0.5,
               persistLineage: Boolean = false,
               portableHash: Boolean = true): DataFrame = {
    // Everything downstream of the tokenize+explode works on the 60-bit
    // portable shingle hash, not the shingle string: minhash folds it to
    // 30 bits anyway, and |A∩B|/|A∪B| over 60-bit hashes equals the
    // string Jaccard up to a ~2⁻⁶⁰ collision probability (the same
    // argument the streaming path documents) — while every shuffle row
    // shrinks from (doc_id, ~40-byte string) to (doc_id, long).
    //
    // `portableHash` picks the hash itself: md5-hex→conv (bit-portable
    // to the DuckDB oracle — the correctness-gate default) vs native
    // xxhash64 (codegen'd, no hex-string round-trip). Measured verdict
    // (BENCH_LARGE.json, 2M docs, min-of-3 calibrated passes): the two
    // chains are within ~10% of each other and the SIGN of the gap has
    // flipped between committed rounds (md5 14% ahead in one, xxhash
    // 10% ahead in the next) — the chain is shuffle/explode-bound, not
    // hash-bound, so the portability tax is inside run-to-run noise.
    // Choose by requirement, not speed: portableHash=true whenever an
    // external system must reproduce the signatures, false otherwise.
    val hashed =
      if (portableHash) phash(col("shingle"))
      else pmod(xxhash64(col("shingle")), lit(1L << 60))
    val sh0 = shingles(docs).select(col("doc_id"), hashed.as("h"))
    // `persistLineage` caches that compact frame, which the branches
    // below re-derive (signatures, sizes, both sides of the verify
    // join): at sf0.1 recompute wins (2.0 s vs 5.4 s — cache build
    // exceeded the recompute); at corpus scale the md5+explode chain
    // dominates and the tradeoff flips — callers choose per scale.
    val sh = if (persistLineage)
      sh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else sh0
    // band signature: concat of the band's r minhash values in seed
    // order — built STRAIGHT from the wide (doc_id, m0..m15) frame as a
    // codegen'd string concat + a 4-way explode (2M → 8M rows), NOT by
    // stack-exploding to K×docs rows and re-grouping with collect_list:
    // the second shuffle+sort aggregation was the chain's most
    // expensive subtree, and its three consumers (selfPairs' eager
    // skew-detection aggregate plus both references to `cand` below)
    // each paid it again. Same sig strings, same oracle.
    val bands0 = bandFrame(minhashWide(sh))
    // under persistLineage, cache bands and cand so each consumer pays
    // the minhash aggregation once (caches stay session-owned, as `sh`)
    val bands = if (persistLineage)
      bands0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else bands0
    // candidate pairs via the skew-aware self-join: degenerate
    // "identical template" band buckets are triangle-salted so their
    // n² pair-work spreads across reducers (Scale.selfPairs) — output
    // is exactly the all-pairs result, so the oracle is unchanged
    val cand0 = graft.ops.Scale.selfPairs(bands, Seq("band", "sig"), "doc_id")
      .select(col("doc_id_1").as("d1"), col("doc_id_2").as("d2")).distinct()
    val cand = if (persistLineage)
      cand0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else cand0
    // exact Jaccard on candidates only (LSH prunes the O(n^2) space)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sh.as("s2"), col("d2") === col("s2.doc_id") && col("s1.h") === col("s2.h"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    cand.join(inter, Seq("d1", "d2"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.as("n1"), col("d1") === col("n1.doc_id"))
      .join(sizes.as("n2"), col("d2") === col("n2.doc_id"))
      .select(col("d1"), col("d2"), col("inter"),
        (col("n1.n") + col("n2.n") - col("inter")).as("uni"),
        (col("inter").cast("double") / (col("n1.n") + col("n2.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Deduplicated-corpus materialization: LSH pairs → connected
    * components → one survivor per near-dup cluster, singletons kept —
    * the step every training-data pipeline runs right after cluster
    * resolution.
    *
    * This anti-join shape is the CANONICAL singleton-coverage path for
    * dedup: the drop-set (near-dup non-survivors only) is the SMALL
    * side, broadcast-hinted below, so docs never emitted as a pair —
    * the overwhelming majority of a real corpus — are never joined at
    * all. [[graft.ops.Components.connectedComponentsTotal]] is the
    * API-level alternative when a caller needs an explicit label for
    * EVERY doc (it left-joins the full universe); for materialization
    * it would add a corpus-sized join for labels this path never
    * consumes. TextQueriesSpec pins the two paths to the same survivor
    * set.
    *
    * `keepBy` picks the survivor within each cluster (the reference
    * policy of real pipelines is "keep the best doc", not "keep the
    * first"): `None` keeps the minimum doc_id — the default, and the
    * fast path, since the component label IS the min doc_id so no
    * metric evaluation is needed. `Some(metric)` keeps the doc with
    * the smallest (`ascending=true`) or largest metric value, ties
    * broken toward the smaller doc_id. The metric is evaluated only on
    * LABELED docs (the small near-dup set), fetched with one broadcast
    * join against the corpus — survivor selection never shuffles the
    * corpus.
    *
    * `persistLineage` forwards to [[lshPairs]] (same session-owned
    * cache contract): the pair chain consumes its shingle/band lineage
    * ~5 times, so at corpus scale — especially when `docs` is itself an
    * already-persisted intermediate — caching the compact hashed frames
    * beats re-deriving the tokenize+explode+agg chain per consumer
    * (measured ~5x on the composed pipeline at bench scale; see
    * BENCH_LARGE.json `corpus_clean`).
    */
  def dedupKeep(docs: DataFrame, threshold: Double = 0.5,
                keepBy: Option[Column] = None,
                ascending: Boolean = true,
                persistLineage: Boolean = false,
                keepText: Boolean = false): DataFrame = {
    val pairs = lshPairs(docs, threshold, persistLineage = persistLineage)
      .select(col("d1"), col("d2"))
    val labels = graft.ops.Components.connectedComponents(pairs, "d1", "d2")
    val dropped = keepBy match {
      case None =>
        labels.filter(col("node") =!= col("component"))
          .select(col("node").as("doc_id"))
      case Some(metric) =>
        val labeled = docs
          .join(broadcast(labels.withColumnRenamed("node", "doc_id")), "doc_id")
          .select(col("doc_id"), col("component"), metric.as("keep_metric"))
        val pick =
          if (ascending) min_by(col("doc_id"), struct(col("keep_metric"), col("doc_id")))
          else max_by(col("doc_id"), struct(col("keep_metric"), -col("doc_id")))
        val survivors = labeled.groupBy("component").agg(pick.as("doc_id"))
          .select(col("doc_id"))
        labels.select(col("node").as("doc_id"))
          .join(survivors, Seq("doc_id"), "left_anti")
    }
    // the broadcast hint pins the intended plan: after the iterative CC
    // computation Spark's size estimate for the drop-set is opaque, and
    // a shuffle-anti here would re-shuffle the whole corpus (PlanSpec)
    // keepText=true hands survivors to a downstream consumer (the
    // tokenize pipeline) with their text — same plan, different select
    docs.join(broadcast(dropped), Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        (if (keepText) col("text") else md5(col("text")).as("content_hash")))
  }

  /** Per-document LSH band signatures (doc_id, band, sig) — the
    * candidate-generation index of [[lshPairs]], public so an existing
    * corpus can compute it ONCE, persist it as a table, and have every
    * incoming batch join against it ([[lshPairsAgainst]]) without the
    * corpus ever being re-shingled or re-shuffled. */
  /** (doc_id, band, sig) frame from a wide minhash frame — the single
    * definition of the band layout (K/BANDS split, comma-joined sig),
    * shared by [[lshPairs]] and [[bandSignatures]] so the self-join and
    * the incremental index can never drift onto different signatures. */
  private def bandFrame(wide: DataFrame): DataFrame = {
    val r = K / BANDS
    val bandCols = (0 until BANDS).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until r).map(i => col(s"m${b * r + i}").cast("string")): _*).as("sig"))
    }
    wide
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  def bandSignatures(docs: DataFrame, portableHash: Boolean = true): DataFrame = {
    val hashed =
      if (portableHash) phash(col("shingle"))
      else pmod(xxhash64(col("shingle")), lit(1L << 60))
    val sh = shingles(docs).select(col("doc_id"), hashed.as("h"))
    bandFrame(minhashWide(sh))
  }

  /** Incremental dedup: match a NEW batch against an EXISTING corpus —
    * the asymmetric variant of [[lshPairs]] that production pipelines
    * run per ingest. Returns one row per batch document that near-
    * duplicates some corpus document: (batch_id, dup_of, jaccard) with
    * dup_of = the best corpus match (highest verified Jaccard, ties to
    * the smallest corpus id — deterministic cross-engine).
    *
    * Scale shape (the reason this is not just lshPairs on the union):
    * the batch side is small relative to the corpus, so every join
    * keeps the corpus streaming and broadcasts batch-derived frames —
    * batch bands against corpus bands (candidate generation), then the
    * candidate corpus-id set against the corpus (so only CANDIDATE
    * corpus docs are ever re-shingled for verification), then batch
    * shingles against those. The corpus is scanned, never shuffled;
    * with `corpusBands` pre-materialized via [[bandSignatures]] the
    * scan-side work per batch is the candidate verification alone.
    * Unlike the self-join in [[lshPairs]] there is no triangle to salt;
    * a degenerate band bucket hot on BOTH sides is handled by AQE skew
    * splitting of the streamed side (the broadcast side replicates to
    * every task by construction).
    */
  def lshPairsAgainst(batch: DataFrame, corpus: DataFrame,
                      threshold: Double = 0.5,
                      corpusBands: Option[DataFrame] = None,
                      portableHash: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = lshMatchesAgainst(batch, corpus, threshold, corpusBands,
      portableHash)
    val best = Window.partitionBy("batch_id")
      .orderBy(col("jaccard").desc, col("corpus_id"))
    scored.withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
      .select(col("batch_id"), col("corpus_id").as("dup_of"), col("jaccard"))
  }

  /** ALL verified batch-vs-corpus matches above `threshold` (the
    * pre-ranking body of [[lshPairsAgainst]]): (batch_id, corpus_id,
    * jaccard). Public so the streaming gate
    * ([[graft.streaming.StreamOps]]) has a batch-parity reference.
    *
    * `portableHash` selects the shingle hash for BATCH band signatures
    * and must match the hash the corpus bands were built with — a
    * pre-materialized `corpusBands` index built via
    * `bandSignatures(corpus, portableHash = false)` joined against
    * md5-hashed batch bands would silently produce zero candidates, so
    * pass the same flag here that built the index. Verification is
    * unaffected (it re-hashes both texts with one consistent hash). */
  def lshMatchesAgainst(batch: DataFrame, corpus: DataFrame,
                        threshold: Double = 0.5,
                        corpusBands: Option[DataFrame] = None,
                        portableHash: Boolean = true): DataFrame = {
    val cBands = corpusBands.getOrElse(bandSignatures(corpus, portableHash))
    val cand = cBands.as("cb")
      .join(broadcast(bandSignatures(batch, portableHash)).as("nb"), Seq("band", "sig"))
      .select(col("nb.doc_id").as("batch_id"), col("cb.doc_id").as("corpus_id"))
      .distinct()
    // verify on candidate docs only: the corpus prunes to candidate ids
    // (broadcast semi join) before any shingling happens
    val candIds = cand.select(col("corpus_id").as("doc_id")).distinct()
    val shC = shingles(corpus.join(broadcast(candIds), Seq("doc_id"), "left_semi"))
      .select(col("doc_id"), phash(col("shingle")).as("h"))
    val shB = shingles(batch).select(col("doc_id"), phash(col("shingle")).as("h"))
    val sizesC = shC.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val sizesB = shB.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = broadcast(cand)
      .join(shC.as("sc"), col("corpus_id") === col("sc.doc_id"))
      .join(broadcast(shB).as("sb"),
        col("batch_id") === col("sb.doc_id") && col("sc.h") === col("sb.h"))
      .groupBy("batch_id", "corpus_id").agg(count(lit(1)).as("inter"))
    cand.join(inter, Seq("batch_id", "corpus_id"), "left")
      .na.fill(0L, Seq("inter"))
      .join(broadcast(sizesB).as("n1"), col("batch_id") === col("n1.doc_id"))
      .join(broadcast(sizesC).as("n2"), col("corpus_id") === col("n2.doc_id"))
      .select(col("batch_id"), col("corpus_id"),
        (col("inter").cast("double") / (col("n1.n") + col("n2.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Materialized corpus-side index for the STREAM-STATIC incremental
    * dedup gate: one row per (band, sig) entry carrying the owning
    * doc's id and its distinct 60-bit shingle-hash set, so an incoming
    * document can be candidate-matched (band equi-join) AND exact-
    * Jaccard-verified (hash-array intersection) without touching the
    * corpus text again. Compute once per corpus version, persist as a
    * table, hand to [[graft.streaming.StreamOps.streamingLshAgainst]].
    * Always the PORTABLE (md5) hash: the streaming side's per-row
    * expressions ([[bandSigsExpr]] / [[shingleHashesExpr]]) are
    * md5-based, so a native-hash index would never collide with them.
    */
  def corpusIndex(corpus: DataFrame): DataFrame =
    bandSignatures(corpus).join(
      corpus.select(col("doc_id"), shingleHashesExpr("text").as("hashes")),
      "doc_id")

  /** Doc ids of `corpus` sharing at least one word-n-gram with
    * `benchmark` — the contamination set, shared by [[decontaminate]]
    * and [[corpusClean]] so the two can never diverge. */
  private def contaminatedIds(corpus: DataFrame, benchmark: DataFrame,
                              n: Int): DataFrame = {
    val benchSh = ngramShingles(benchmark, n).select(col("shingle")).distinct()
    ngramShingles(corpus, n)
      .join(broadcast(benchSh), Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
  }

  /** Benchmark decontamination: drop every corpus document that shares
    * at least one word-n-gram with the benchmark/eval set — the
    * published train-test-overlap control (GPT-3 §C / C4: 8-13-gram
    * matching; default n=5 here scales to the synthetic corpus's short
    * docs). Returns the clean corpus as (doc_id, content_hash).
    *
    * Scale shape: the benchmark is tiny next to the corpus, so its
    * distinct shingle set broadcasts against one streaming pass over
    * the exploded corpus shingles (left_semi), and the resulting
    * contaminated-id set (small by construction — contamination is the
    * exception) broadcasts into the final anti-join. The corpus is
    * scanned twice, shuffled never.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 5): DataFrame =
    corpus
      .join(broadcast(contaminatedIds(corpus, benchmark, n)), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), md5(col("text")).as("content_hash"))

  /** Containment-DEGREE decontamination: per corpus document, the
    * fraction of its distinct word-n-grams that appear anywhere in the
    * benchmark/eval set — the graded form of [[decontaminate]]'s binary
    * any-overlap drop (the PaLM/Llama "contamination fraction" report:
    * docs are bucketed by overlap percentage rather than dropped on one
    * shared shingle). Emits (doc_id, n_shingles, n_contaminated,
    * contain_frac); docs shorter than n tokens carry no shingles and
    * drop out, exactly like the shingle-based dedup chain.
    *
    * Scale shape: identical to [[decontaminate]] — the benchmark's
    * distinct shingle set broadcasts onto ONE streaming pass over the
    * corpus's exploded shingles, and the only shuffle is the compact
    * (doc_id, counts) aggregation. The corpus never shuffles on the
    * shingle key.
    */
  def containmentFraction(corpus: DataFrame, benchmark: DataFrame,
                          n: Int = 5): DataFrame = {
    val benchSh = ngramShingles(benchmark, n).select(col("shingle")).distinct()
      .withColumn("hit", lit(true))
    ngramShingles(corpus, n)
      .join(broadcast(benchSh), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_contaminated"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        round(col("n_contaminated") / col("n_shingles"), 6).as("contain_frac"))
  }

  /** Sliding context-window chunking (the tokenizer-side
    * `return_overflowing_tokens` shape): cut each document's token
    * stream into windows of `chunkLen` tokens whose starts step by
    * `stride` (= chunkLen − overlap), so consecutive chunks share
    * `chunkLen − stride` tokens; the tail chunk may be shorter, and a
    * document never yields a chunk starting at/past its end. Emits one
    * row per chunk: (doc_id, chunk_id, n_tokens, chunk_hash).
    * [[packChunks]] is the complementary loader-side op (documents
    * packed head-to-tail into exact-budget sequences); this one keeps
    * every window inside its own document, the long-document split used
    * for context-bounded training and embedding-indexing.
    *
    * Scale shape: pure per-row fan-out — the chunk count is
    * 1 + ceil(max(n − chunkLen, 0)/stride) by construction, the
    * explode is bounded by n_tokens/stride per doc, and the whole pass
    * is map-only: zero exchanges (PlanSpec-pinned).
    */
  def chunkDocs(docs: DataFrame, chunkLen: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkLen >= 1 && stride >= 1 && stride <= chunkLen,
      s"need 1 <= stride <= chunkLen, got chunkLen=$chunkLen stride=$stride")
    docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
           |  sequence(0, (greatest(size(toks) - $chunkLen, 0) + $stride - 1) div $stride),
           |  j -> slice(toks, j * $stride + 1, $chunkLen))""".stripMargin))
        .as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
  }

  // ---- Bloom-filter membership dedup (Bloom 1970; the Dolma exact-
  // dedup gate shape: probe new documents against a compact filter of
  // everything already ingested) ----

  /** In-lambda SQL fragment for the portable 60-bit hash (the expr-
    * string twin of [[phash]]). */
  private def phashFrag(inner: String): String =
    s"CAST(conv(substring(md5($inner), 1, 15), 16, 10) AS BIGINT)"

  /** The k Bloom bit positions of a document's text, as a distinct
    * array (two of the k hashes may collide): position_i =
    * phash(text ⊕ i) mod m, salt-concatenated so the k functions are
    * independent in both engines. */
  private[graft] def bloomPositionsExpr(m: Long, k: Int): String =
    s"""array_distinct(transform(sequence(0, ${k - 1}),
       |  i -> ${phashFrag("concat(text, '#bloom', i)")} % ${m}L))""".stripMargin

  /** Build the Bloom filter over the seen corpus: the distinct SET bit
    * positions of all k hashes of every document. Sparse rows-of-set-
    * bits is the distributed representation — it joins, unions
    * (incremental ingest = union + distinct), and persists as a plain
    * table; at n documents it holds ≤ n·k rows regardless of m, so m
    * can be sized generously (false-positive rate (1−e^{−kn/m})^k)
    * without materializing m bits anywhere. */
  def bloomBuild(seen: DataFrame, m: Long = 1L << 24, k: Int = 5): DataFrame =
    seen.select(explode(expr(bloomPositionsExpr(m, k))).as("bit")).distinct()

  /** Probe a batch against a built filter: a document is flagged iff
    * ALL its (distinct) bit positions are set — Bloom's contract: a
    * document whose exact text was seen ALWAYS flags (no false
    * negatives); an unseen document flags only at the false-positive
    * rate. Emits (doc_id, bloom_hit).
    *
    * Scale shape: the batch fans out to k compact (doc_id, bit) rows
    * per doc and equi-joins the filter on the uniformly-distributed bit
    * key (no skew by construction), then aggregates once on doc_id —
    * two compact-key shuffles, no text ever leaves its partition. When
    * the filter is small next to the batch, Spark/AQE broadcasts it;
    * neither side ever pays an all-pairs comparison.
    */
  def bloomProbe(batch: DataFrame, bits: DataFrame,
                 m: Long = 1L << 24, k: Int = 5): DataFrame =
    batch
      .select(col("doc_id"), explode(expr(bloomPositionsExpr(m, k))).as("bit"))
      .join(bits.withColumn("present", lit(true)), Seq("bit"), "left")
      .groupBy("doc_id")
      .agg((count(lit(1)) === sum(when(col("present"), 1L).otherwise(0L)))
        .as("bloom_hit"))

  /** The filter folded into ONE broadcastable row: a `bmap`
    * word-index → 64-bit-word map (bit b lives in word b div 64 at
    * offset b mod 64). Entries are bounded by m/64 regardless of how
    * many documents the filter has absorbed — 2^24 bits is a ≤262k-entry
    * (~4 MB) row — so this is the dense artifact the streaming gate
    * broadcasts per micro-batch, built from the same sparse bits table
    * the batch probe joins. */
  def bloomWordMapRow(bits: DataFrame): DataFrame =
    bits
      .groupBy(expr("bit div 64").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(bit % 64 as int)))").as("word"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("word")))).as("bmap"))

  /** Per-row membership test against a bound `bmap` column: true iff
    * every one of the text's k bit positions is set — the expression
    * twin of [[bloomProbe]]'s join-and-count (parity spec-pinned). */
  private[graft] def bloomHitExpr(m: Long, k: Int): Column =
    expr(s"""forall(${bloomPositionsExpr(m, k)},
            |  p -> (coalesce(element_at(bmap, p div 64), 0L)
            |        & shiftleft(1L, cast(p % 64 as int))) != 0)""".stripMargin)

  /** GPT-style sequence packing (concat-and-chunk): lay every document
    * out head-to-tail in doc_id order and cut the token stream into
    * fixed-`budget` training sequences — the data-prep step between a
    * cleaned corpus and a pretraining loader. Emits one row per
    * (document × chunk it overlaps): (chunk_id, doc_id, off_start,
    * off_len) where [off_start, off_start+off_len) is the token
    * sub-range of THIS doc that lands in THIS chunk — exactly the slice
    * list a packing loader materializes. Every chunk holds exactly
    * `budget` tokens except the last; a doc longer than `budget` spans
    * several chunks.
    *
    * Scale shape: the global running token count is the classic
    * single-partition-window trap; it runs partition-and-stitch instead
    * ([[graft.ops.Stitch.globalCumsum]] — within-chunk window + driver
    * prefix-sum of one tiny total per `chunkWidth` ids, broadcast
    * back), so the pass parallelizes at any corpus size and the chunk
    * fan-out explode is bounded by ceil(n_tokens/budget) per doc.
    * PlanSpec pins no-single-partition-exchange.
    */
  def packChunks(docs: DataFrame, budget: Long,
                 chunkWidth: Long = 100000L): DataFrame =
    packCounts(docs.select(col("doc_id"),
      wsTokenCount("text").cast("long").as("n_tokens")), budget, chunkWidth)

  /** [[packChunks]] over a precomputed (doc_id, n_tokens) frame — the
    * form a tokenizer-aware pipeline needs (pack by ENCODED subword
    * counts, not whitespace counts; see [[corpusTokenize]]). Same
    * stitched global cumsum, same output contract. */
  def packCounts(withN: DataFrame, budget: Long,
                 chunkWidth: Long = 100000L): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val cum = graft.ops.Stitch.globalCumsum(withN,
      expr(s"doc_id div $chunkWidth"), Seq(col("doc_id")),
      col("n_tokens"), "cum")
    cum
      .withColumn("start", col("cum") - col("n_tokens"))
      .withColumn("chunk_id",
        explode(expr(s"sequence(start div $budget, (cum - 1) div $budget)")))
      .select(
        col("chunk_id"),
        col("doc_id"),
        (greatest(col("start"), col("chunk_id") * lit(budget)) - col("start"))
          .as("off_start"),
        (least(col("cum"), (col("chunk_id") + 1) * lit(budget))
          - greatest(col("start"), col("chunk_id") * lit(budget))).as("off_len"))
  }

  /** Deterministic training-mix allocation: per language keep the top
    * `floor(budget × weight)` documents by `score` (ties to the
    * smaller doc_id), the reproducible form of domain/language
    * re-balancing in training-data pipelines. One shuffle (window by
    * lang); languages without a weight contribute nothing.
    */
  def corpusMix(docs: DataFrame, weights: Map[String, Double],
                budget: Long, score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kCol = weights.foldLeft(lit(0L)) { case (acc, (l, w)) =>
      when(col("lang") === l, lit(math.floor(budget * w).toLong)).otherwise(acc)
    }
    val rank = row_number()
      .over(Window.partitionBy("lang").orderBy(score.desc, col("doc_id")))
    docs.withColumn("mix_rank", rank)
      .filter(col("mix_rank") <= kCol)
      .select(col("doc_id"), col("lang"), col("mix_rank"))
  }

  /** Per-language doc budgets computed by the last [[corpusMixTemp]]
    * run, cached so the oracle can compare the SAME integer literals
    * (the [[cachedMerges]] pattern). */
  @volatile private[text] var cachedTempBudgets: Option[Seq[(String, Long)]] = None

  /** Temperature-scaled mixture allocation — the multilingual-LM
    * sampling recipe (XLM-R, Conneau et al. 2020 §3.1 / mT5, Xue et al.
    * 2021 §3.2: sample language l with p_l ∝ n_l^alpha; alpha < 1
    * upsamples tail languages): derive the per-language weights from
    * the corpus's OWN language counts, then allocate `budget` documents
    * by those weights, best score first, exactly like [[corpusMix]].
    *
    * The language histogram is a languages-sized aggregate collected to
    * the driver (bounded: one row per language); the final per-language
    * doc budgets are INTEGER literals computed driver-side — both
    * engines compare against identical numbers, no cross-engine `pow`
    * hazard — and cached for oracle rendering. The mix itself is one
    * per-language window shuffle (the [[corpusMix]] plan). */
  def corpusMixTemp(docs: DataFrame, alpha: Double = 0.5, budget: Long = 200L,
                    score: Column = col("n_chars")): DataFrame = {
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val pows = counts.map { case (l, n) => l -> math.pow(n.toDouble, alpha) }
    val tot = pows.map(_._2).sum
    val weights = pows.map { case (l, p) => l -> p / tot }
    cachedTempBudgets = Some(weights.map { case (l, w) =>
      l -> math.floor(budget * w).toLong }.toSeq)
    corpusMix(docs, weights.toMap, budget, score)
  }

  /** corpus_mix_temp oracle, rendered from the driver-computed integer
    * budgets of the last run (absent until the query runs). */
  private def tempMixOracles: Map[String, String] = cachedTempBudgets match {
    case None => Map.empty
    case Some(ks) =>
      val cases = ks.map { case (l, k) => s"WHEN '${l.replace("'", "''")}' THEN $k" }
        .mkString(" ")
      Map("corpus_mix_temp" ->
        s"""WITH r AS (SELECT doc_id, lang,
           |  CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS INT) AS mix_rank
           |FROM documents)
           |SELECT doc_id, lang, mix_rank FROM r
           |WHERE mix_rank <= CASE lang $cases ELSE 0 END""".stripMargin)
  }

  /** Per-language TOKEN budgets + cutoff state computed by the last
    * [[corpusMixTokens]] run, cached so the oracle compares the SAME
    * integer literals (the [[cachedTempBudgets]] pattern). */
  @volatile private[graft] var cachedTokenBudgets: Option[Seq[(String, Long)]] = None

  /** Token-budget temperature mixing — [[corpusMixTemp]] in the units
    * training mixtures are actually specified in. mT5 (Xue et al. 2021
    * §3.2) and XLM-R (Conneau et al. 2020 §3.1) sample language l with
    * p_l ∝ n_l^alpha where n_l is the language's TOKEN mass, and a
    * training run buys `tokenBudget` tokens, not documents; this
    * operator allocates floor(tokenBudget × p_l) tokens per language
    * and keeps best-score documents (ties to the smaller doc_id) while
    * the language's running token count stays inside its budget —
    * i.e. keep doc ⇔ inclusive cumsum(n_tokens) over (score DESC,
    * doc_id) ≤ B_l. Emits (doc_id, lang, n_tokens).
    *
    * Scale shape (100 TB): [[corpusMix]]'s per-language window would
    * drag a whole language's documents through ONE task; this plan
    * never runs a per-language window over the corpus:
    *  1. a (lang, score) aggregate — bounded by |langs| × |distinct
    *     score values|, which is why `score` must be DISCRETE (a
    *     length, a quantized quality score; default n_chars) — collects
    *     to the driver, which walks each language's scores descending
    *     to find the cutoff score s*_l: every doc scoring above s*_l is
    *     kept outright, and R_l = B_l − (token mass above s*_l) tokens
    *     remain for the tie group AT s*_l;
    *  2. the above-cutoff keep is a map-only literal-CASE filter;
    *  3. only the tie rows (docs scoring exactly s*_l) pay an ordered
    *     pass, and that runs partition-and-stitch
    *     ([[graft.ops.Stitch.globalCumsum]] under a (langIdx, doc_id)
    *     monotone chunk key) — the driver subtracts each language's
    *     incoming base from the stitched global cumsum via literals it
    *     already knows, so even a fully-degenerate score distribution
    *     (every doc the same score) parallelizes.
    */
  def corpusMixTokens(docs: DataFrame, alpha: Double = 0.5,
                      tokenBudget: Long = 20000L,
                      score: Column = col("n_chars")): DataFrame = {
    require(tokenBudget >= 0, s"token budget must be >= 0, got $tokenBudget")
    val base = docs.select(col("doc_id"), col("lang"),
      wsTokenCount("text").cast("long").as("n_tokens"),
      score.cast("long").as("s"))
    // bounded driver table: one row per (lang, distinct score value)
    val hist: Array[(String, Long, Long)] = base.groupBy("lang", "s")
      .agg(sum(col("n_tokens")).as("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val langs = hist.map(_._1).distinct.sorted
    val totals = langs.map(l => l -> hist.filter(_._1 == l).map(_._3).sum)
    val pows = totals.map { case (l, n) => l -> math.pow(n.toDouble, alpha) }
    val z = pows.map(_._2).sum
    val budgets = pows.map { case (l, p) =>
      l -> math.floor(tokenBudget * p / z).toLong }
    cachedTokenBudgets = Some(budgets.toSeq)
    val bmap = budgets.toMap
    // cutoff walk: s*_l = the first (descending) score whose token mass
    // overflows the budget; None = the whole language fits
    case class Cut(sStar: Option[Long], rem: Long, tieTok: Long)
    val cuts: Map[String, Cut] = langs.map { l =>
      val rows = hist.filter(_._1 == l).sortBy(-_._2)
      var acc = 0L
      var res: Option[Cut] = None
      for ((_, sv, tok) <- rows if res.isEmpty) {
        if (acc + tok > bmap(l)) res = Some(Cut(Some(sv), bmap(l) - acc, tok))
        else acc += tok
      }
      l -> res.getOrElse(Cut(None, 0L, 0L))
    }.toMap
    def caseOver(f: String => Column): Column =
      langs.foldLeft(lit(null).cast("long")) { (acc, l) =>
        when(col("lang") === l, f(l)).otherwise(acc) }
    // stage 2: above-cutoff docs keep outright (s* None → keep all)
    val cutCol = caseOver(l => lit(cuts(l).sStar.getOrElse(Long.MinValue)))
    val full = base.filter(col("s") > cutCol)
    // stage 3: tie rows at s*_l — stitched cumsum in (langIdx, doc_id)
    // order; per-language incoming base subtracted via driver literals
    val tieLangs = langs.filter(l => cuts(l).sStar.isDefined)
    val tied = if (tieLangs.isEmpty) full.limit(0) else {
      val tieCol = caseOver(l => cuts(l).sStar.map(lit(_).cast("long"))
        .getOrElse(lit(null).cast("long")))
      val idxCol = tieLangs.zipWithIndex.foldLeft(lit(-1L)) {
        case (acc, (l, i)) => when(col("lang") === l, lit(i.toLong)).otherwise(acc) }
      val ties = base.filter(col("s") === tieCol)
        .withColumn("_lidx", idxCol)
      val chunk = col("_lidx") * lit(1L << 42) + (col("doc_id") / lit(1L << 20)).cast("long")
      val cum = graft.ops.Stitch.globalCumsum(ties, chunk,
        Seq(col("doc_id")), col("n_tokens"), "cum")
      val tieBase: Map[String, Long] = {
        var run = 0L
        tieLangs.map { l => val b = run; run += cuts(l).tieTok; l -> b }.toMap
      }
      val baseCol = caseOver(l => lit(tieBase.getOrElse(l, 0L)))
      val remCol = caseOver(l => lit(cuts(l).rem))
      cum.filter(col("cum") - baseCol <= remCol)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("s"))
    }
    full.unionByName(tied)
      .select(col("doc_id"), col("lang"), col("n_tokens").cast("int").as("n_tokens"))
  }

  /** corpus_mix_tokens oracle, rendered from the driver-computed
    * integer token budgets of the last run: the reference semantics is
    * the plain per-language window cumsum the engine's cutoff plan
    * refuses to run at scale — keep while inclusive running tokens over
    * (n_chars DESC, doc_id) fit the language's budget. */
  private def tokenMixOracles: Map[String, String] = cachedTokenBudgets match {
    case None => Map.empty
    case Some(ks) =>
      val cases = ks.map { case (l, k) => s"WHEN '${l.replace("'", "''")}' THEN $k" }
        .mkString(" ")
      Map("corpus_mix_tokens" ->
        s"""WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens, n_chars
           |  FROM documents),
           |c AS (SELECT doc_id, lang, n_tokens,
           |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS cum
           |  FROM t)
           |SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens FROM c
           |WHERE cum <= CASE lang $cases ELSE 0 END""".stripMargin)
  }

  /** The full training-corpus cleaning pipeline as ONE composed plan —
    * the query a user of this engine actually ships:
    *
    *  1. benchmark decontamination ([[decontaminate]] semantics): drop
    *     docs sharing a word-n-gram with the eval set (broadcast
    *     semi + anti, corpus never shuffled);
    *  2. quality filtering ([[qualityKeep]]): per-row Gopher/C4 flag,
    *     zero shuffle — placed BEFORE dedup so the expensive LSH chain
    *     only sees docs worth keeping;
    *  3. near-dup dedup + survivor materialization ([[dedupKeep]]):
    *     LSH chain over the pre-filtered corpus, cluster-min survivor,
    *     broadcast anti-join.
    *
    * Returns the clean corpus as (doc_id, content_hash).
    *
    * Cache contract (same as `persistLineage` in [[lshPairs]]): with
    * `persistIntermediate=true` the cleaned text frame is persisted at
    * `storageLevel` (default MEMORY_AND_DISK) and stays SESSION-OWNED —
    * repeated calls in one session accumulate caches that only
    * `spark.catalog.clearCache()` (or session end) reclaims. Callers
    * looping over corpus versions should clearCache between runs or
    * pass `persistIntermediate=false`. At corpus sizes where the
    * cleaned text outgrows executor storage memory, DISK_ONLY trades
    * eviction-pressure churn for sequential re-reads.
    */
  def corpusClean(corpus: DataFrame, benchmark: DataFrame,
                  n: Int = 5, threshold: Double = 0.5,
                  persistIntermediate: Boolean = true,
                  persistLineage: Boolean = false,
                  extraFilter: Option[Column] = None,
                  storageLevel: org.apache.spark.storage.StorageLevel =
                    org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
                  keepText: Boolean = false): DataFrame = {
    // `extraFilter` composes additional per-row keeps into the quality
    // stage (e.g. repetitionKeep()) without touching the pipeline shape
    val clean0 = corpus
      .join(broadcast(contaminatedIds(corpus, benchmark, n)), Seq("doc_id"), "left_anti")
      .filter(extraFilter.foldLeft(qualityKeep())(_ && _))
    // the dedup chain consumes its input ~5 times (three shingle
    // derivations, sizes, the final anti-join); without materialization
    // each consumer re-executes the decontamination subtree INCLUDING
    // the full-corpus n-gram explode — measured 7.4 s vs 4.2 s for
    // dedup_keep on the LARGER raw corpus at sf0.1. Caching the
    // cleaned text (cache stays session-owned, as lshPairs documents)
    // is the in-query form of what a production pipeline does anyway:
    // materialize the filtered corpus, then dedup the materialization.
    val clean = if (persistIntermediate) clean0.persist(storageLevel) else clean0
    dedupKeep(clean, threshold, persistLineage = persistLineage, keepText = keepText)
  }

  /** Stage-survivor funnel of the cleaning pipeline — the observability
    * report every production curation job publishes next to its output:
    * how many documents entered, survived benchmark decontamination,
    * survived the quality gate, and survived near-dup removal. One row
    * (n_input, n_decontaminated, n_quality, n_dedup).
    *
    * The first three stage counts fuse into ONE corpus pass: the
    * contaminated-id set joins as a broadcast FLAG (left join, not
    * anti), so input/decontaminated/quality are conditional sums of
    * the same scan — the decontamination subtree (broadcast build +
    * corpus scan) evaluates once here instead of three times. The
    * dedup count re-runs the
    * [[corpusClean]] stages rather than sharing a cache — a report
    * should not take ownership of pipeline caches; callers running
    * both pass `persistIntermediate` through corpusClean itself. */
  def corpusFunnel(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
                   threshold: Double = 0.5): DataFrame = {
    val flagged = corpus.join(
      broadcast(contaminatedIds(corpus, benchmark, n).withColumn("_contam", lit(true))),
      Seq("doc_id"), "left")
    val stages = flagged.agg(
      count(lit(1)).as("n_input"),
      sum(when(col("_contam").isNull, 1L).otherwise(0L)).as("n_decontaminated"),
      sum(when(col("_contam").isNull && qualityKeep(), 1L).otherwise(0L)).as("n_quality"))
    stages.crossJoin(corpusClean(corpus, benchmark, n, threshold,
      persistIntermediate = false).agg(count(lit(1)).as("n_dedup")))
  }

  /** Merge table learned by the last [[corpusTokenize]] run, cached for
    * oracle rendering (its OWN slot — `bpe_encode` trains on the raw
    * corpus, this pipeline on the cleaned survivors; sharing
    * [[cachedMerges]] would silently cross the two oracles). */
  @volatile private[text] var cachedTokenizeMerges: Option[Seq[(Int, String, String)]] = None

  /** The full curate-tokenize-pack loop as ONE composed pipeline — what
    * a training-data job actually ships end to end:
    *
    *  1. [[corpusClean]] (decontaminate → quality gate → LSH dedup),
    *     survivors kept WITH text;
    *  2. [[bpeTrain]] on the SURVIVORS (the tokenizer a real pipeline
    *     trains sees post-clean text — training it on the raw corpus
    *     would spend merge slots on boilerplate the clean step just
    *     removed);
    *  3. [[bpeEncode]] with the learned table → per-doc subword counts;
    *  4. [[packCounts]] by the ENCODED counts (the whole point of
    *     tokenizer-aware packing: whitespace counts mis-size training
    *     chunks by the subword fan-out factor).
    *
    * Emits the pack layout (chunk_id, doc_id, off_start, off_len) in
    * ENCODED-token space. The cleaned survivor frame is persisted
    * (session-owned, the [[corpusClean]] cache contract) because three
    * consumers walk it: the train word-frequency pass, the encode
    * vocabulary pass, and the encode fan-out.
    *
    * Scale shape (100 TB): every stage keeps its own audited shape —
    * the clean chain's broadcast/anti-join discipline, ONE corpus pass
    * for tokenizer training (driver merge loop), the broadcast
    * encoded-vocabulary join, and the stitched global cumsum (no
    * single-partition exchange). The composition adds NO new shuffle:
    * stage boundaries hand over (doc_id, n_tokens)-sized frames only.
    *
    * The DuckDB oracle composes the stage oracles over the SAME learned
    * merge literals (cached per run), so the end-to-end layout is
    * hash-verified, not just the stages. */
  def corpusTokenize(corpus: DataFrame, benchmark: DataFrame,
                     budget: Long = 512L, numMerges: Int = 20,
                     n: Int = 5, threshold: Double = 0.5,
                     persistLineage: Boolean = false): DataFrame = {
    val cleaned = corpusClean(corpus, benchmark, n, threshold,
      persistLineage = persistLineage, keepText = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = bpeTrain(cleaned, numMerges)
    cachedTokenizeMerges = Some(merges)
    packCounts(
      bpeEncode(cleaned, merges).select(col("doc_id"), col("n_tokens")),
      budget)
  }

  /** The quality-metric SQL bodies over a lambda-bound token array
    * `toks` (plus the raw `text` column), in output order — the ONE
    * definition [[qualityStats]] and [[qualityKeep]] both render from,
    * so an edit to a formula (and its DuckDB oracle mirror) can never
    * drift between the stats frame and the filter predicate. */
  private val qualityMetricSqls: Seq[(String, String)] = Seq(
    "n_words" -> "size(toks)",
    // exact arithmetic: total chars minus the n-1 separators, as txt_stats
    "mean_word_len" ->
      "CAST(length(text) - (size(toks) - 1) AS DOUBLE) / size(toks)",
    "frac_distinct" ->
      "CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks)",
    "stop_distinct" ->
      s"size(filter(array(${STOP.map(s => s"'$s'").mkString(", ")}), sw -> array_contains(toks, sw)))")

  private def keepSql(minWords: Int, minMeanLen: Double, maxMeanLen: Double,
                      minFracDistinct: Double, minStopDistinct: Int): String = {
    val m = qualityMetricSqls.toMap
    s"""${m("n_words")} >= $minWords
       | AND ${m("mean_word_len")} >= $minMeanLen
       | AND ${m("mean_word_len")} <= $maxMeanLen
       | AND ${m("frac_distinct")} >= $minFracDistinct
       | AND ${m("stop_distinct")} >= $minStopDistinct""".stripMargin
  }

  /** Gopher/C4-style document quality metrics + keep flag (published
    * web-corpus filtering heuristics: word-count bounds, mean word
    * length, vocabulary diversity, stopword presence — Rae et al. 2021
    * "Scaling Language Models" §A1.1, Raffel et al. 2020 C4 filters).
    * Strictly per-row array arithmetic: no shuffle, no UDF, scales as a
    * map-only pass at any corpus size. Thresholds are constructor-level
    * policy; defaults split the synthetic corpus non-degenerately.
    *
    * The token array is tokenized ONCE per row: all metrics and the
    * keep flag evaluate inside one `inline(transform(array(split(...`
    * generator, so the split is bound as a lambda variable the
    * optimizer cannot duplicate (the [[bandSigsExpr]] idiom; PlanSpec
    * pins one split per row).
    *
    * [[qualityOutliers]] is the data-driven complement: instead of the
    * fixed Gopher/C4 thresholds it trims by the corpus's OWN
    * distribution (Tukey IQR fences). */
  def qualityStats(docs: DataFrame,
                   minWords: Int = 20,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 8.0,
                   minFracDistinct: Double = 0.35,
                   minStopDistinct: Int = 1): DataFrame = {
    val fields = (qualityMetricSqls.map { case (n, sql) => s"'$n', $sql" } :+
      s"'keep', ${keepSql(minWords, minMeanLen, maxMeanLen, minFracDistinct, minStopDistinct)}")
      .mkString(", ")
    docs.select(col("doc_id"), expr(
      s"""inline(transform(array(split(text, ' ')), toks ->
         |  named_struct($fields)))""".stripMargin))
  }

  /** The [[qualityStats]] keep flag as a standalone boolean Column over
    * a `text` field — per-row, so a pipeline can filter WITHOUT a join
    * back to the metrics frame. The five threshold terms all reference
    * the SAME lambda-bound token array: binding `split` once per row
    * (rather than once per term) is cosmetic at sf0.1 and real money at
    * 100 TB, where relying on codegen subexpression elimination to
    * rescue five independent splits is fragile (see [[bandSigsExpr]]).
    */
  def qualityKeep(minWords: Int = 20,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 8.0,
                  minFracDistinct: Double = 0.35,
                  minStopDistinct: Int = 1): Column = expr(
    s"""element_at(transform(array(split(text, ' ')), toks ->
       |  ${keepSql(minWords, minMeanLen, maxMeanLen, minFracDistinct, minStopDistinct)}), 1)""".stripMargin)

  /** IQR fences (lo, hi) per signal of the last [[qualityOutliers]]
    * run, cached for the oracle (the cachedMerges pattern). */
  @volatile private[graft] var cachedOutlierFences:
    Option[(Double, Double, Double, Double)] = None

  /** Data-driven robust outlier trim (Tukey fences): flag documents
    * whose token count or mean word length falls outside
    * [q1 − k·IQR, q3 + k·IQR] of the CORPUS'S OWN distribution — the
    * robust-statistics complement to [[qualityKeep]]'s fixed
    * Gopher/C4 thresholds, for corpora whose healthy range the fixed
    * bounds misjudge (code, non-Latin scripts).
    *
    * Scale shape: quantiles are EXACT at bounded driver memory
    * ([[graft.ops.Scale.exactQuantileGrid]] — sketch-bracket then
    * count, never a full sort or collect; both SIGNALS and both
    * QUANTILES share every distributed pass, so the fences cost the
    * same three scans as a single median). The fences come back as
    * driver literals, so the flagging pass is map-only. Emits (doc_id,
    * n_tokens, mean_word_len, len_outlier, wl_outlier, kept). */
  def qualityOutliers(docs: DataFrame, k: Double = 1.5): DataFrame = {
    val sig = docs.select(col("doc_id"),
      wsTokenCount("text").cast("long").as("n_tokens"),
      round((length(col("text")) - (wsTokenCount("text") - 1)).cast("double") /
        wsTokenCount("text"), 6).as("mean_word_len"))
    val cs = Seq("n_tokens", "mean_word_len")
    val grid = graft.ops.Scale.exactQuantileGrid(sig, cs, Seq(0.25, 0.75))
    def fences(c: String): (Double, Double) = {
      val (q1, q3) = (grid((c, 0.25)), grid((c, 0.75)))
      val iqr = q3 - q1; (q1 - k * iqr, q3 + k * iqr)
    }
    val (tl, th) = fences("n_tokens")
    val (wl, wh) = fences("mean_word_len")
    cachedOutlierFences = Some((tl, th, wl, wh))
    sig.select(col("doc_id"), col("n_tokens"), col("mean_word_len"),
      (col("n_tokens") < tl || col("n_tokens") > th).as("len_outlier"),
      (col("mean_word_len") < wl || col("mean_word_len") > wh).as("wl_outlier"))
      .withColumn("kept", !col("len_outlier") && !col("wl_outlier"))
  }

  /** The Gopher duplicate-n-gram-fraction trio in ONE per-row pass
    * (Rae et al. 2021 §A1.1 applies the repetition filters for several
    * n simultaneously): for each n in `ns`, the fraction of n-gram
    * INSTANCES that are repeats of an earlier instance in the same
    * document — `(total - distinct) / total`, the same signal as
    * [[topNgram]]'s `dup_gram_frac` — emitted as one `dup_frac_n`
    * column per order. Documents shorter than n words have no n-grams
    * and score 0.0.
    *
    * Unlike [[topNgram]] (which needs per-gram COUNTS for the top-gram
    * mode and therefore a per-document shuffle), the duplicate fraction
    * only needs per-document totals, so all orders evaluate as per-row
    * array arithmetic inside one generator — zero shuffles, one
    * tokenize per row (PlanSpec pins both). */
  /** Duplicate-instance fraction of word-n-grams over a lambda-bound
    * token array `toks` — the single SQL body [[repetitionSignals]] and
    * [[repetitionKeep]] both render from. The gram array is itself
    * lambda-bound (g) so size/array_distinct share one
    * materialization, as the toks binding. */
  private def dupFracSql(n: Int): String = {
    val parts = (0 until n)
      .map(j => if (j == 0) "element_at(toks, i)" else s"element_at(toks, i + $j)")
      .mkString(", ")
    s"""CASE WHEN size(toks) >= $n THEN
       |    element_at(transform(array(transform(sequence(1, size(toks) - ${n - 1}),
       |        i -> concat_ws(' ', $parts))),
       |      g -> CAST(size(g) - size(array_distinct(g)) AS DOUBLE) / size(g)), 1)
       |  ELSE CAST(0.0 AS DOUBLE) END""".stripMargin
  }

  def repetitionSignals(docs: DataFrame, ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 2), s"n-gram orders must be >= 2, got $ns")
    val fields = ns.map(n => s"'dup_frac_$n', ${dupFracSql(n)}").mkString(", ")
    docs.select(col("doc_id"), expr(
      s"""inline(transform(array(split(text, ' ')), toks ->
         |  named_struct($fields)))""".stripMargin))
  }

  /** Gopher repetition thresholds as defaults: a doc is dropped when
    * its duplicate-n-gram fraction exceeds the per-order bound (the
    * instance-fraction variant of Rae et al. 2021 §A1.1's duplicate
    * n-gram filters, applied for several n simultaneously). Per-row,
    * one tokenize (same lambda binding as [[qualityKeep]]); compose
    * into the cleaning pipeline via `corpusClean(extraFilter =
    * Some(repetitionKeep()))`. */
  def repetitionKeep(maxDupFrac: Map[Int, Double] =
      Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)): Column = {
    require(maxDupFrac.nonEmpty && maxDupFrac.keys.forall(_ >= 2),
      s"n-gram orders must be >= 2, got ${maxDupFrac.keys}")
    val terms = maxDupFrac.toSeq.sortBy(_._1)
      .map { case (n, t) => s"(${dupFracSql(n)}) <= $t" }.mkString("\n AND ")
    expr(
      s"""element_at(transform(array(split(text, ' ')), toks ->
         |  $terms), 1)""".stripMargin)
  }

  /** Per-document top word-n-gram + repetition fractions (the Gopher
    * repetition signals: fraction of duplicate n-gram instances, and
    * fraction of characters covered by the single most frequent
    * n-gram). Ties on count break to the lexicographically smallest
    * gram so the result is deterministic cross-engine.
    *
    * Scale: the explode fans out ×(words−n+1) per document, then both
    * shuffles key on doc_id (+gram) — per-key cardinality is bounded by
    * document length, so there is no global hot key; the window runs
    * per-document, never a single-partition sort.
    */
  def topNgram(docs: DataFrame, n: Int = 2): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    import org.apache.spark.sql.expressions.Window
    val gramExpr = ngramArrayExpr(n)
    // ONE shuffle, before the fan-out: repartitioning the compact
    // (doc_id, text) rows by doc_id satisfies both downstream
    // distributions — HashPartitioning(doc_id) is a subset of the
    // groupBy(doc_id, gram) clustering AND the window's doc_id
    // partitioning — so the exploded gram rows (~2x the text bytes)
    // never cross the network at all (plan-pinned in PlanSpec)
    val grams = docs
      .select(col("doc_id"), length(col("text")).as("lc"),
        split(col("text"), " ").as("toks"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("lc"), explode(expr(gramExpr)).as("gram"))
    val counts = grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"), max(col("lc")).as("lc"))
    val byDoc = Window.partitionBy("doc_id")
    counts
      .withColumn("rn", row_number().over(byDoc.orderBy(col("cnt").desc, col("gram"))))
      .withColumn("n_grams", sum(col("cnt")).over(byDoc))
      .withColumn("n_distinct_grams", count(lit(1)).over(byDoc))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"),
        col("gram").as("top_gram"),
        col("cnt").as("top_cnt"),
        col("n_grams"),
        col("n_distinct_grams"),
        ((col("n_grams") - col("n_distinct_grams")).cast("double") / col("n_grams"))
          .as("dup_gram_frac"),
        ((col("cnt") * length(col("gram"))).cast("double") / col("lc"))
          .as("top_char_frac"))
  }

  /** Per-document unigram language-model score: mean negative log
    * probability of the document's tokens under the corpus's own
    * unigram distribution — the bag-of-words form of CCNet's LM
    * quality filter (Wenzek et al. 2020 §4.3: score documents by LM
    * negative log-likelihood, bucket the corpus by it). Documents made
    * of globally rare tokens score high ("surprising"), boilerplate
    * scores low. Emits (doc_id, n_tokens, nll).
    *
    * Scale shape (100 TB):
    *  - the vocabulary count is one map-side-combined aggregate: what
    *    crosses the network is per-partition (token, partial-count)
    *    rows — vocab-sized, not corpus-sized;
    *  - the count table joins back BROADCAST, never as a token-keyed
    *    shuffle of the corpus: token keys are maximally skewed
    *    (stopwords), so a sort-merge join here would drag a large
    *    fraction of the corpus through a handful of reducers. At web
    *    scale the vocabulary must be bounded before broadcasting —
    *    pass `topV` to keep the V most frequent tokens and score the
    *    tail as out-of-vocabulary (`oovCount` pseudo-count), exactly
    *    what a fixed-vocab LM filter does anyway;
    *  - the per-document re-aggregation reuses the pre-explode
    *    `repartition(doc_id)` clustering (the [[topNgram]] idiom), so
    *    the exploded token rows — the ~1× text-byte fan-out — never
    *    cross the network (PlanSpec-pinned);
    *  - `ln` is 1-ulp across libms → the score is quantized at 1e-6
    *    for cross-engine comparison (the [[topNgram]]/tfidf idiom).
    */
  /** Vocabulary counting pass shared by [[unigramScore]] and
    * [[unigramModelRow]] (the streaming gate's batch-parity contract
    * depends on the two staying identical): raw scan, no repartition —
    * the partial agg combines map-side and only vocab-sized partials
    * shuffle. */
  private def unigramVocab(docs: DataFrame): DataFrame = docs
    .select(explode(split(col("text"), " ")).as("tok"))
    .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** Deterministic topV truncation (count desc, key asc) — ONE
    * definition of pruning determinism for every count table. */
  private def truncTop(df: DataFrame, topV: Option[Int],
                       cnt: String, key: String): DataFrame =
    topV.fold(df)(v => df.orderBy(col(cnt).desc, col(key)).limit(v))

  private def truncVocab(full: DataFrame, topV: Option[Int]): DataFrame =
    truncTop(full, topV, "cnt", "tok")

  /** (bigram, count) table — the ONE corpus-sized counting pass the
    * bigram-family scorers share ([[bigramScore]], [[kneserNeyScore]]). */
  private def bigramCounts(docs: DataFrame): DataFrame = docs
    .select(split(col("text"), " ").as("toks"))
    .select(explode(expr(ngramArrayExpr(2))).as("bg"))
    .groupBy("bg").agg(count(lit(1)).as("bcnt"))

  /** Full-corpus token-count normalizer — a plain scan + scalar
    * aggregate, shared for the same parity reason. */
  private def unigramNormalizer(docs: DataFrame): DataFrame = docs
    .agg(sum(size(split(col("text"), " "))).cast("double").as("tot"))

  def unigramScore(docs: DataFrame, topV: Option[Int] = None,
                   oovCount: Double = 0.5): DataFrame = {
    val full = unigramVocab(docs)
    // normalizer over the FULL corpus even when the broadcast side is
    // topV-truncated (OOV mass must still be "rare", not renormalized).
    // Derived as a per-row token-count sum — identical value to
    // sum(cnt) over the vocab, but a plain scan + scalar aggregate
    // instead of re-executing the explode + vocabulary shuffle (the
    // count subtree is NOT exchange-reusable across the broadcast and
    // normalizer branches: canonicalization differs, so deriving tot
    // from `full` would scan and shuffle the corpus a third time).
    val tot = unigramNormalizer(docs)
    val counts = truncVocab(full, topV)
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .join(broadcast(counts), Seq("tok"), "left")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(-log(coalesce(col("cnt").cast("double"), lit(oovCount)) / col("tot"))), 6)
          .as("nll"))
  }

  /** Per-document bigram language-model score under stupid backoff
    * (Brants et al. 2007 "Large Language Models in Machine
    * Translation" §4: S(w|w') = f(w'w)/f(w') when the bigram was seen,
    * else α·f(w)/N — no discounting, which is what makes the model a
    * pure count table and therefore distributable). The order-2 step
    * beyond [[unigramScore]]'s CCNet-style filter: word-order scrambles
    * and stitched-together text score high (surprising transitions)
    * even when their unigram profile looks natural. Scores transitions
    * only; emits (doc_id, n_transitions, nll2). NOTE: documents with
    * fewer than 2 tokens have no transitions and are OMITTED from the
    * output (unlike [[unigramScore]]/[[tokenEntropy]], which emit every
    * document) — compose per-doc score joins with a LEFT join on this
    * frame and treat an absent row as "no bigram evidence", or the
    * composition silently drops short documents.
    *
    * Scale shape (100 TB):
    *  - both count tables are map-side-combined aggregates; the bigram
    *    table is the big one (~corpus token count at worst), so `topV`
    *    bounds BOTH tables before broadcast — exactly what a pruned
    *    production LM ships — and truncation is deterministic
    *    (count desc, gram asc);
    *  - the conditional-probability table attaches the left-word
    *    unigram denominator vocab-to-vocab BEFORE broadcasting, so the
    *    corpus-sized scoring pass touches only broadcast frames — the
    *    pair table, the (pruned) right-word table the backoff arm
    *    needs, and the one-row normalizer — and never shuffles on a
    *    token key;
    *  - scoring reuses the [[unigramScore]] clustering idiom: the
    *    transition explode sits above `repartition(doc_id)`, so the
    *    fan-out never crosses the network;
    *  - the backoff arithmetic is per-row; `ln` quantized at 1e-6 for
    *    cross-engine comparison.
    */
  def bigramScore(docs: DataFrame, topV: Option[Int] = None, alpha: Double = 0.4,
                  oovCount: Double = 0.5): DataFrame = {
    val uniFull = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("ucnt"))
    val tot = docs
      .agg(sum(size(split(col("text"), " "))).cast("double").as("tot"))
    val biExpr = ngramArrayExpr(2)
    val biFull = bigramCounts(docs)
    val uni = truncTop(uniFull, topV, "ucnt", "tok")
    val bi = truncTop(biFull, topV, "bcnt", "bg")
    // conditional-probability table: the left-word denominator joins
    // vocab-to-vocab (both frames bounded) so the corpus-sized pass
    // below touches ONE broadcast table; the denominator uses the FULL
    // unigram count even when topV truncates (backoff mass must stay
    // calibrated, not renormalized to the retained vocabulary)
    val biProb = bi
      .withColumn("lw", element_at(split(col("bg"), " "), 1))
      .join(uniFull.select(col("tok").as("lw"), col("ucnt").as("lcnt")), Seq("lw"))
      .select(col("bg"), col("bcnt"), col("lcnt"))
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(biExpr)).as("bg"))
      .withColumn("rw", element_at(split(col("bg"), " "), 2))
      .join(broadcast(biProb), Seq("bg"), "left")
      .join(broadcast(uni.select(col("tok").as("rw"), col("ucnt").as("rcnt"))), Seq("rw"), "left")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_transitions"),
        round(avg(-log(
          when(col("bcnt").isNotNull, col("bcnt").cast("double") / col("lcnt"))
            .otherwise(lit(alpha) * coalesce(col("rcnt").cast("double"), lit(oovCount)) / col("tot")))), 6)
          .as("nll2"))
  }

  /** Per-document bigram score under INTERPOLATED KNESER-NEY smoothing
    * (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.24 for the
    * interpolated form) — the discounting family production LM filters
    * (CCNet's KenLM) actually use, one step past [[bigramScore]]'s
    * stupid backoff:
    *
    *   P(w|w') = max(c(w'w) − D, 0)/c(w'·)
    *           + (D · N1+(w'·)/c(w'·)) · (N1+(·w)/N1+(··))
    *
    * with c(w'·) = Σ_w c(w'w), the LEFT-CONTEXT token count (it differs
    * from the raw unigram count for document-final words, and only this
    * denominator makes P(·|w') a proper distribution),
    *
    * where N1+(w'·) counts distinct continuations of w', N1+(·w)
    * counts distinct left contexts of w (the "how novel is this word's
    * placement" continuation probability that makes KN better than
    * frequency backoff), and N1+(··) is the number of distinct bigram
    * types. Every term is a ratio of count-table aggregates, which is
    * what makes the model distributable — no EM, no iteration.
    * Scores transitions only; emits (doc_id, n_transitions, nll_kn);
    * documents with < 2 tokens are omitted (the [[bigramScore]]
    * LEFT-join composition convention). A word that never occurs as a
    * right-hand token has no continuation count; its Pcont takes a 0.5
    * pseudo-type so log stays finite (mirrored in the oracle).
    *
    * Scale shape (100 TB): ONE corpus-sized counting pass (the bigram
    * count aggregate, map-side combined); every other model table —
    * left-context counts, both continuation-type counts, the type
    * total — derives from that table's rows, never from the corpus.
    * The bigram table is ~corpus-token-count rows unpruned, so at web
    * scale `topV` is REQUIRED (deterministic count-desc/gram-asc
    * truncation, the pruned-production-LM form [[bigramScore]] ships);
    * the derived tables then describe the pruned model consistently,
    * and contexts with no retained bigram back off to the pure
    * continuation probability (lambda = 1). Everything broadcasts onto
    * the doc_id-clustered transition fan-out; the corpus never
    * shuffles on a token key. */
  def kneserNeyScore(docs: DataFrame, discount: Double = 0.75,
                     topV: Option[Int] = None): DataFrame = {
    require(discount > 0 && discount < 1, s"KN discount must be in (0,1), got $discount")
    val biExprKn = ngramArrayExpr(2)
    // ONE corpus-sized counting pass; every other model table derives
    // from the bigram count table (its keys ARE the distinct pairs):
    // lc = sum(bcnt) by left word (the KN denominator c(w'.) — the
    // left-context token count, which differs from the raw unigram
    // count for document-final words and is what makes P(.|w') a
    // proper distribution), contL/contR = row counts by side, types =
    // the table's row count. The naive form recomputed each of these
    // with its own corpus explode — 5 scans where 1 suffices.
    val bcFull = bigramCounts(docs)
    // `topV` prunes the TYPE INVENTORY deterministically (count desc,
    // gram asc) — the pruned-production-LM form the bigram table needs
    // at web scale (it is ~corpus-token-count rows unpruned); all
    // derived tables then describe the pruned model consistently, and
    // transitions whose context has no retained bigram fall back to
    // the pure continuation probability below
    val bc = truncTop(bcFull, topV, "bcnt", "bg")
    val sided = bc.select(col("bg"), col("bcnt"),
      element_at(split(col("bg"), " "), 1).as("lw"),
      element_at(split(col("bg"), " "), 2).as("rw"))
    val contR = sided.groupBy("rw").agg(count(lit(1)).as("cont_r"))
    val types = bc.agg(count(lit(1)).cast("double").as("n_types"))
    // one aggregation produces both the denominator and the
    // continuation-type count — same keys, no join needed
    val lwTable = sided.groupBy("lw")
      .agg(sum(col("bcnt")).as("lcnt"), count(lit(1)).as("cont_l"))
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(biExprKn)).as("bg"))
      .withColumn("rw", element_at(split(col("bg"), " "), 2))
      .withColumn("lw", element_at(split(col("bg"), " "), 1))
      .join(broadcast(bc.select("bg", "bcnt")), Seq("bg"), "left")
      // LEFT join: under topV a transition's context may have no
      // retained bigram at all — it falls back to the pure continuation
      // probability (lambda = 1); with the full table the fallback arm
      // is dead code (every transition is its own bigram)
      .join(broadcast(lwTable), Seq("lw"), "left")
      .join(broadcast(contR), Seq("rw"), "left")
      .crossJoin(broadcast(types))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_transitions"),
        round(avg(-log(
          coalesce(
            greatest(coalesce(col("bcnt"), lit(0L)).cast("double") - discount, lit(0.0)) / col("lcnt"),
            lit(0.0))
            + coalesce(lit(discount) * col("cont_l") / col("lcnt"), lit(1.0))
            * (coalesce(col("cont_r").cast("double"), lit(0.5)) / col("n_types")))), 6)
          .as("nll_kn"))
  }

  /** Per-document TRIGRAM score under interpolated Kneser-Ney smoothing
    * (Chen & Goodman 1999 eq. 4.24 applied recursively) — the order-3
    * form of [[kneserNeyScore]], one step closer to the 5-gram KenLM
    * CCNet actually filters with:
    *
    *   P(w₃|w₁w₂) = max(c(w₁w₂w₃) − D, 0)/c(w₁w₂·)
    *              + (D · N1+(w₁w₂·)/c(w₁w₂·)) · P(w₃|w₂)
    *   P(w₃|w₂)   = max(N1+(·w₂w₃) − D, 0)/N1+(·w₂·)
    *              + (D · N1+(w₂·)/N1+(·w₂·)) · Pcont(w₃)
    *   Pcont(w₃)  = N1+(·w₃)/N1+(··)
    *
    * where the MIDDLE level runs on continuation-type counts derived
    * from the trigram type inventory (Chen & Goodman's
    * lower-order-from-higher-order construction): N1+(·w₂w₃) = distinct
    * left contexts of the pair, N1+(·w₂·) = trigram types with middle
    * w₂, N1+(w₂·) = distinct pairs starting at w₂, N1+(·w₃) = distinct
    * pairs ending at w₃, N1+(··) = total pair types — every one a
    * GROUP BY over the trigram count table's rows. Per retained
    * context, each level's probabilities sum to 1 exactly (the
    * telescoping max(c−D,0)/den + D·types/den identity; spec-pinned
    * through the recursive backoff). Scores trigram transitions only;
    * emits (doc_id, n_transitions, nll_kn3); documents with < 3 tokens
    * are omitted (the [[bigramScore]] LEFT-join composition
    * convention). Unseen w₃ takes the 0.5 pseudo-type; a context with
    * no retained trigram backs off with lambda = 1 at that level.
    *
    * Scale shape (100 TB): ONE corpus-sized counting pass (the trigram
    * count aggregate, map-side combined); ALL five model tables derive
    * from that table's rows — the corpus is never re-scanned and never
    * shuffled on a token key. The trigram table is the unbounded one
    * (≈ corpus token count), so `topV` is REQUIRED at web scale
    * (deterministic count-desc/gram-asc truncation); the derived
    * tables then describe the pruned model consistently. Everything
    * broadcasts onto the doc_id-clustered transition fan-out
    * ([[unigramScore]] idiom: the explode sits above
    * repartition(doc_id), so the fan-out never crosses the network). */
  def kneserNeyScore3(docs: DataFrame, discount: Double = 0.75,
                      topV: Option[Int] = None): DataFrame =
    kneserNeyScoreN(docs, 3, discount, topV)

  /** Interpolated Kneser-Ney at ARBITRARY order n >= 3 — the general
    * form of [[kneserNeyScore3]] (order 2 is [[kneserNeyScore]]); n=5
    * is the actual CCNet/KenLM filter configuration (Wenzek et al.
    * 2020 §4.3; Heafield 2011). The recursion is Chen & Goodman 1999's
    * lower-order-from-higher-order construction:
    *
    *  - level n scores raw n-gram counts against the (n−1)-word
    *    context denominator;
    *  - level i < n scores CONTINUATION TYPE counts t_i (distinct
    *    left extensions among (i+1)-gram types) against their own
    *    denominators, derived by one aggregation per level from the
    *    level above — B_{i-1} = B_i grouped on its last i−1 words;
    *  - level 1 is Pcont(w) = N1+(·w)/N1+(··) over the pair types.
    *
    * Per retained context each level telescopes to mass 1 exactly
    * (spec-pinned through the recursion at n=4). Documents with < n
    * tokens are omitted; emits (doc_id, n_transitions, nll_kn{n}).
    *
    * Scale shape (100 TB): still ONE corpus-sized counting pass — the
    * n-gram count aggregate — with ALL 2(n−1) model tables derived
    * from its rows by vocab-sized aggregations; `topV` is REQUIRED at
    * web scale (the n-gram type inventory grows with the corpus) and
    * every derived table describes the pruned model consistently, with
    * lambda = 1 backoff at any level whose context was pruned away.
    * Every model table broadcasts onto the doc_id-clustered transition
    * fan-out; the corpus is never re-scanned and never shuffled on a
    * token key. */
  def kneserNeyScoreN(docs: DataFrame, n: Int, discount: Double = 0.75,
                      topV: Option[Int] = None): DataFrame = {
    require(n >= 3, s"kneserNeyScoreN is the order >= 3 family (got $n); order 2 is kneserNeyScore")
    require(discount > 0 && discount < 1, s"KN discount must be in (0,1), got $discount")
    def wc(from: Int, to: Int): Seq[String] = (from to to).map(i => s"w$i")
    // NOTE (measured, r9): an alternative that carries the n-gram as a
    // STRUCT of words end to end (no concat_ws in the counting pass, no
    // re-splits in the scoring pass) benched 2.5-5x SLOWER at 1M docs
    // (interleaved min-of-6: 19.8 s string-key vs 50.4 s struct-key) —
    // one compact concatenated string key beats n variable-length
    // string fields in both the aggregate and the broadcast-join
    // hashing. The concat/split round trip stays on purpose.
    val tcFull = docs
      .select(split(col("text"), " ").as("toks"))
      .select(explode(expr(ngramArrayExpr(n))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
    val tc = truncTop(tcFull, topV, "cnt", "g")
    val sided = tc.select(col("g") +: col("cnt") +:
      (1 to n).map(i => element_at(split(col("g"), " "), i).as(s"w$i")): _*)
    // top level: denominator + continuation-type count per (w1..w_{n-1})
    val ctxN = sided.groupBy(wc(1, n - 1).map(col): _*)
      .agg(sum(col("cnt")).as(s"den$n"), count(lit(1)).as(s"ty$n"))
    // type-count chain: B_i keyed by the LAST i words, t_i = distinct
    // left extensions among the (i+1)-gram types; each level is one
    // aggregation over the level above, never a corpus re-scan
    val bT = scala.collection.mutable.Map(
      (n - 1) -> sided.groupBy(wc(2, n).map(col): _*).agg(count(lit(1)).as(s"t${n - 1}")))
    val midT = scala.collection.mutable.Map.empty[Int, DataFrame]
    for (i <- (n - 1) to 2 by -1) {
      midT(i) = bT(i).groupBy(wc(n - i + 1, n - 1).map(col): _*)
        .agg(sum(col(s"t$i")).as(s"den$i"), count(lit(1)).as(s"ty$i"))
      bT(i - 1) = bT(i).groupBy(wc(n - i + 2, n).map(col): _*)
        .agg(count(lit(1)).as(s"t${i - 1}"))
    }
    // bottom-level normalizer: total pair types N1+(··)
    val totTy = bT(2).agg(count(lit(1)).cast("double").as("tot_ty"))
    // the recursive probability, built bottom-up; a missing context at
    // any level (pruned or unseen) backs off with lambda = 1
    var p: Column = coalesce(col("t1").cast("double"), lit(0.5)) / col("tot_ty")
    for (i <- 2 until n)
      p = coalesce(
        greatest(coalesce(col(s"t$i"), lit(0L)).cast("double") - discount, lit(0.0)) / col(s"den$i"),
        lit(0.0)) +
        coalesce(lit(discount) * col(s"ty$i") / col(s"den$i"), lit(1.0)) * p
    p = coalesce(
      greatest(coalesce(col("cnt"), lit(0L)).cast("double") - discount, lit(0.0)) / col(s"den$n"),
      lit(0.0)) +
      coalesce(lit(discount) * col(s"ty$n") / col(s"den$n"), lit(1.0)) * p
    var scored = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(ngramArrayExpr(n))).as("g"))
    for (i <- 1 to n)
      scored = scored.withColumn(s"w$i", element_at(split(col("g"), " "), i))
    scored = scored
      .join(broadcast(tc.select("g", "cnt")), Seq("g"), "left")
      .join(broadcast(ctxN), wc(1, n - 1), "left")
    for (i <- (n - 1) to 2 by -1)
      scored = scored
        .join(broadcast(bT(i)), wc(n - i + 1, n), "left")
        .join(broadcast(midT(i)), wc(n - i + 1, n - 1), "left")
    scored
      .join(broadcast(bT(1)), Seq(s"w$n"), "left")
      .crossJoin(broadcast(totTy))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_transitions"),
        round(avg(-log(p)), 6).as(s"nll_kn$n"))
  }

  /** The [[kneserNeyScoreN]] DuckDB oracle, generated for any order —
    * CTE chain mirroring the derivation table for table, the nested
    * interpolation expression term for term (unpruned at oracle scale,
    * so the lambda-1 pruning arms are dead here; spec-pinned instead). */
  private def knOracleSql(n: Int): String = {
    val D = "0.75"
    def wc(from: Int, to: Int): Seq[String] = (from to to).map(i => s"w$i")
    val gramExpr = {
      val parts = (0 until n).map(j => s"toks[i + $j]").mkString(", ' ', ")
      s"list_transform(range(1, len(toks) - ${n - 2}), i -> concat($parts))"
    }
    val splitCols = (1 to n).map(i => s"string_split(g, ' ')[$i] AS w$i").mkString(", ")
    val chain = new StringBuilder
    chain ++= s"b${n - 1} AS (SELECT ${wc(2, n).mkString(", ")}, count(*) AS t${n - 1} FROM s GROUP BY ${wc(2, n).mkString(", ")}),\n"
    for (i <- (n - 1) to 2 by -1) {
      chain ++= s"mid$i AS (SELECT ${wc(n - i + 1, n - 1).mkString(", ")}, sum(t$i) AS den$i, count(*) AS ty$i FROM b$i GROUP BY ${wc(n - i + 1, n - 1).mkString(", ")}),\n"
      chain ++= s"b${i - 1} AS (SELECT ${wc(n - i + 2, n).mkString(", ")}, count(*) AS t${i - 1} FROM b$i GROUP BY ${wc(n - i + 2, n).mkString(", ")}),\n"
    }
    var pSql = s"(coalesce(b1.t1, 0.5) / tot.tot_ty)"
    for (i <- 2 until n)
      pSql = s"(greatest(coalesce(b$i.t$i, 0) - $D, 0.0) / mid$i.den$i" +
        s" + $D * mid$i.ty$i / mid$i.den$i * $pSql)"
    pSql = s"greatest(coalesce(tcn.cnt, 0) - $D, 0.0) / ctx.den$n" +
      s" + $D * ctx.ty$n / ctx.den$n * $pSql"
    val joins = new StringBuilder
    joins ++= s"LEFT JOIN tcn USING (g)\nJOIN ctx USING (${wc(1, n - 1).mkString(", ")})\n"
    for (i <- (n - 1) to 2 by -1) {
      joins ++= s"LEFT JOIN b$i USING (${wc(n - i + 1, n).mkString(", ")})\n"
      joins ++= s"JOIN mid$i USING (${wc(n - i + 1, n - 1).mkString(", ")})\n"
    }
    joins ++= s"LEFT JOIN b1 USING (w$n)\nCROSS JOIN tot"
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |allg AS (SELECT unnest($gramExpr) AS g FROM t),
       |gd AS (SELECT doc_id, unnest($gramExpr) AS g FROM t WHERE len(toks) >= $n),
       |tcn AS (SELECT g, count(*) AS cnt FROM allg GROUP BY g),
       |s AS (SELECT g, cnt, $splitCols FROM tcn),
       |ctx AS (SELECT ${wc(1, n - 1).mkString(", ")}, sum(cnt) AS den$n, count(*) AS ty$n FROM s GROUP BY ${wc(1, n - 1).mkString(", ")}),
       |${chain.toString.stripSuffix(",\n")},
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS tot_ty FROM b2),
       |gw AS (SELECT doc_id, g, $splitCols FROM gd)
       |SELECT gw.doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
       |  round(avg(-ln($pSql)), 6) AS nll_kn$n
       |FROM gw
       |$joins
       |GROUP BY gw.doc_id""".stripMargin
  }

  /** Per-document duplicate-n-gram CHARACTER coverage — the form
    * Gopher's repetition thresholds are actually stated in (Rae et al.
    * 2021 Table A1: "fraction of characters in duplicate n-grams"):
    * mark every token position covered by an n-gram that occurs >= 2
    * times WITHIN the document (all occurrences, overlaps counted
    * once), and report covered token characters over total token
    * characters. Complements [[repetitionSignals]]'s count-based
    * `dup_frac_n` — a long duplicated span weighs by its length here,
    * not by its gram count. Emits (doc_id, n_tokens, dup_char_frac).
    *
    * Scale shape (100 TB): the [[scrubFrequentNgrams]] idiom — the
    * positional gram explode, the within-doc gram count, the
    * duplicated-subset rejoin, and the coverage re-aggregation all run
    * above doc_id clustering, so the fan-out never crosses the
    * network; what DOES move are three compact-row doc_id exchanges
    * (one per consumer of the pre-explode repartition — exchange reuse
    * is defeated across the subtrees; PlanSpec pins exactly three).
    * Per-row O(G²) HOF counting is avoided on purpose: with large
    * documents the grouped count stays linear. */
  def dupNgramCoverage(docs: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val pre = docs.repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val grams = pre.select(col("doc_id"), posexplode(expr(ngramArrayExpr(n))))
    // count first, collect positions after: a collect_list over EVERY
    // (doc, gram) group materializes position buffers for the
    // overwhelmingly unique majority just to throw them away — counting
    // (map-side combinable), filtering to the duplicated subset, and
    // re-joining the positional rows measured 2.3x faster at the 2M-doc
    // bench (37.6 -> 12.8 s min-of-3); the join keys on (doc_id, gram)
    // atop the existing doc_id clustering, so no new exchange
    val dupSet = grams.groupBy(col("doc_id"), col("col"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2).drop("c")
    val dupStarts = grams.join(dupSet, Seq("doc_id", "col"))
      .groupBy("doc_id")
      .agg(collect_list(col("pos")).as("starts"))
    pre.join(dupStarts, Seq("doc_id"), "left")
      .withColumn("covered", expr(
        s"array_distinct(flatten(transform(coalesce(starts, CAST(array() AS ARRAY<INT>)), p -> sequence(p, p + ${n - 1}))))"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        round(
          expr("aggregate(covered, 0L, (acc, i) -> acc + length(element_at(toks, i + 1)))")
            .cast("double") /
            expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))"), 6)
          .as("dup_char_frac"))
  }

  /** Per-document unigram (token) Shannon entropy — the
    * RedPajama-V2-style information-content quality signal: templated /
    * repetitive documents carry low entropy, natural prose sits in a
    * band, and H = ln(n) − (Σ c·ln c)/n needs only within-document
    * counts. Emits (doc_id, n_tokens, entropy).
    *
    * Scale shape: the [[topNgram]] idiom — one `repartition(doc_id)` of
    * compact rows; the token explode and BOTH aggregations (per
    * (doc_id, tok), then per doc_id) reuse that clustering, so the
    * fan-out never crosses the network and the whole op is one compact
    * shuffle. */
  def tokenEntropy(docs: DataFrame): DataFrame =
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum(col("c")).as("n_tokens"),
        round(log(sum(col("c")).cast("double")) -
          sum(col("c").cast("double") * log(col("c").cast("double"))) / sum(col("c")), 6)
          .as("entropy"))

  /** One-pass signal sweep: every token-level quality signal the
    * curation stack consumes — token count, distinct-token count and
    * fraction, mean word length, stopword coverage, and Shannon entropy
    * — derived from a SINGLE corpus scan and a single compact shuffle.
    * The point is the plan shape, not a new signal: at 100 TB a
    * pipeline that runs [[qualityStats]] + [[tokenEntropy]] as separate
    * queries pays the corpus scan once per signal family; this emits
    * the union of their token-derived columns for one scan.
    *
    * Everything derives from the (doc_id, tok, count) level, so no text
    * or per-row precomputation rides through the fan-out: the explode
    * re-aggregates on the pre-explode doc_id clustering (one
    * repartition Exchange, both aggregates reuse it — PlanSpec pins
    * exactly one exchange and one scan). Emits (doc_id, n_tokens,
    * n_distinct, frac_distinct, mean_word_len, stop_distinct, entropy).
    */
  def signalSweep(docs: DataFrame): DataFrame = {
    val stopsArr = STOP.map(s => s"'$s'").mkString("array(", ", ", ")")
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(count(lit(1)).cast("double") / sum(col("c")), 6).as("frac_distinct"),
        round(sum(length(col("tok")) * col("c")).cast("double") / sum(col("c")), 6)
          .as("mean_word_len"),
        sum(when(expr(s"array_contains($stopsArr, tok)"), 1L).otherwise(0L))
          .cast("int").as("stop_distinct"),
        round(log(sum(col("c")).cast("double")) -
          sum(col("c").cast("double") * log(col("c").cast("double"))) / sum(col("c")), 6)
          .as("entropy"))
  }

  /** Compression-ratio repetitiveness signal: highly repetitive or
    * machine-generated text DEFLATEs far below natural prose, so
    * `deflate_bytes / n_bytes` is a one-pass repetitiveness proxy used
    * by corpus-curation toolkits next to the Gopher/C4 heuristics — it
    * catches long-range repetition the bounded-n dup-fraction signals
    * miss, at zero shuffle. Map-only, codegen'd kernel
    * ([[graft.functions.DeflateLen]]), no UDF, no exchange. No DuckDB
    * oracle (DEFLATE is not SQL-expressible) → rows-only; pinned in
    * CompressSpec against direct JVM deflate and on constructed
    * repetitive-vs-shuffled fixtures. */
  def compressionRatio(docs: DataFrame): DataFrame = {
    val dl = org.apache.spark.sql.GraftBridge.column(
      graft.functions.DeflateLen(
        org.apache.spark.sql.GraftBridge.expression(docs("text"))))
    docs.select(
      col("doc_id"),
      expr("octet_length(text)").as("n_bytes"),
      dl.as("deflate_bytes"))
      .withColumn("ratio",
        when(col("n_bytes") === 0, lit(null).cast("double"))
          .otherwise(round(col("deflate_bytes").cast("double") /
            col("n_bytes").cast("double"), 6)))
  }

  /** The per-row deflate ratio as a scalar column — the
    * [[compressionRatio]] arithmetic shared with the streaming curation
    * gate (stateless, so it composes into a micro-batch plan for free). */
  def compressRatioExpr(c: Column): Column = {
    val dl = org.apache.spark.sql.GraftBridge.column(
      graft.functions.DeflateLen(org.apache.spark.sql.GraftBridge.expression(c)))
    val nb = length(encode(c, "UTF-8"))
    when(nb === 0, lit(null).cast("double"))
      .otherwise(round(dl.cast("double") / nb.cast("double"), 6))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    * "Winnowing: Local Algorithms for Document Fingerprinting" — the
    * MOSS algorithm): hash every word-k-gram, slide a window of `w`
    * consecutive hashes, select each window's minimum — the selected
    * DISTINCT hash set is the fingerprint. The paper's guarantee: two
    * documents sharing any run of ≥ w + k − 1 tokens share at least one
    * fingerprint (spec-pinned), while the expected density is 2/(w+1)
    * of all grams — a LOCAL, position-robust alternative to the global
    * shingle-set families ([[minhashSignatures]] samples the whole set;
    * winnowing guarantees coverage of every sufficiently long run).
    * Documents shorter than w grams keep min-of-all (≥1 fingerprint
    * whenever any gram exists); documents under k tokens emit zero.
    * Emits (doc_id, n_grams, n_fingerprints, fp_hash) where fp_hash is
    * the md5 of the sorted fingerprint stream.
    *
    * Scale shape: pure map-only per-row arrays — zero exchanges
    * (PlanSpec-pinned); the fingerprint SET (bounded by ~2·n_grams/(w+1))
    * is the compact artifact a cross-doc matcher would explode and
    * equi-join on, exactly the [[lshPairs]] bucket-join shape.
    */
  /** Dedup-normalization pass (the CCNet/Dolma pre-hash step, Wenzek et
    * al. 2020 §4.1: hashes are computed over NORMALIZED text so
    * case/punctuation variants of the same content deduplicate):
    * lowercase, strip everything outside [a-z0-9 ], collapse whitespace
    * runs, trim. Emits (doc_id, n_tokens_norm, norm_hash) — norm_hash
    * is what the exact-dedup / Bloom chain would key on. Map-only, zero
    * exchanges; both regexes are RE2-portable so the DuckDB oracle
    * replays the identical transform. */
  def normalizeText(docs: DataFrame): DataFrame =
    docs
      // one-pass codegen'd kernel; the regex chain it replaces
      // ([[normalizeTextRegex]]) measured 42.7 s over 2M docs (two Java
      // regex passes per row) vs byte-loop cost here — the SQL-regex
      // form remains the cross-engine semantic definition (the DuckDB
      // oracle runs it) and kernel==regex parity is spec-pinned
      // including multi-byte and exotic-lowercase inputs
      .withColumn("norm", org.apache.spark.sql.GraftBridge.column(
        graft.functions.NormalizeDedup(
          org.apache.spark.sql.GraftBridge.expression(col("text")))))
      .select(col("doc_id"),
        when(length(col("norm")) === 0, 0L)
          .otherwise(size(split(col("norm"), " ")).cast("long")).as("n_tokens_norm"),
        md5(col("norm")).as("norm_hash"))

  /** The regex twin of [[normalizeText]] — the portable semantic
    * definition (what the DuckDB oracle evaluates), retained for the
    * kernel-parity spec. */
  private[graft] def normalizeTextRegex(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm", trim(regexp_replace(regexp_replace(
        lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
      .select(col("doc_id"),
        when(length(col("norm")) === 0, 0L)
          .otherwise(size(split(col("norm"), " ")).cast("long")).as("n_tokens_norm"),
        md5(col("norm")).as("norm_hash"))

  /** Multi-phrase blocklist scan (the C4/Gopher badword gate at
    * production list sizes): per document, the total (overlapping)
    * occurrence count of any blocklist phrase, the number of distinct
    * phrases present, and the keep verdict — via ONE Aho-Corasick pass
    * per row ([[graft.functions.BlocklistStats]], codegen'd) instead of
    * per-phrase `contains` (O(|list| × |text|) per row; C4's real list
    * is ~400 phrases, where the automaton is ~400× fewer text scans).
    * Matching is case-insensitive substring over the lowercased text.
    *
    * Scale shape: pure map-only — the automaton ships once per executor
    * as a codegen reference object (a few MB for a 1k-phrase list),
    * zero exchanges, zero joins; at 100 TB this is scan-bound by
    * construction (PlanSpec-pinned via BlocklistSpec).
    */
  def blocklistFilter(docs: DataFrame, phrases: Seq[String]): DataFrame = {
    val stats = org.apache.spark.sql.GraftBridge.column(
      graft.functions.BlocklistStats(
        org.apache.spark.sql.GraftBridge.expression(col("text")), phrases))
    docs.select(col("doc_id"), stats.as("bl"))
      .select(col("doc_id"),
        col("bl").getItem(0).as("n_hits"),
        col("bl").getItem(1).as("n_phrases_hit"),
        (col("bl").getItem(0) === 0).as("kept"))
  }

  /** Corpus-level Zipf profile: the least-squares slope/intercept of
    * log(frequency) against log(rank) over the top-`topV` vocabulary —
    * the standard sanity report on a corpus's token distribution
    * (natural text runs slope ≈ −1, Zipf 1935; templated or synthetic
    * corpora flatten it), plus vocabulary size, token total, and the
    * top-V coverage fraction. One row out.
    *
    * Scale shape: ONE vocabulary aggregate (map-side combined,
    * output bounded by vocab size — the txt_vocab_topk shape); the
    * rank window runs over the `topV`-row LIMIT frame, bounded BY
    * CONSTRUCTION, so its single partition is a non-issue. Cross-engine
    * exactness: ln(rank)/ln(freq) quantize to integer micro-units
    * per term and sum as longs (associative, partition-order-free);
    * the slope divides the exact sums once at the end and rounds 1e-6
    * (the tfidf discipline). */
  def zipfProfile(docs: DataFrame, topV: Int = 1000): DataFrame = {
    require(topV >= 2, s"need >= 2 ranks for a slope, got $topV")
    import org.apache.spark.sql.expressions.Window
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val totals = vocab.agg(
      count(lit(1)).as("vocab_size"), sum(col("freq")).as("total_tokens"))
    val top = vocab.orderBy(col("freq").desc, col("tok")).limit(topV)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("tok"))).cast("long"))
      .select(
        round(log(col("rank").cast("double")) * 1e6).cast("long").as("xq"),
        round(log(col("freq").cast("double")) * 1e6).cast("long").as("yq"),
        col("freq"))
    val sums = top.agg(
      count(lit(1)).as("n"), sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
      sum(col("xq") * col("yq")).as("sxy"), sum(col("xq") * col("xq")).as("sxx"),
      sum(col("freq")).as("top_freq"))
    // combine the EXACT long sums in doubles (n·Σxy overflows a long at
    // production token totals; the expression shape is identical in the
    // oracle so the IEEE result matches bit-for-bit before the round)
    val nD = col("n").cast("double"); val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double"); val sxyD = col("sxy").cast("double")
    val sxxD = col("sxx").cast("double")
    val slope = (nD * sxyD - sxD * syD) / (nD * sxxD - sxD * sxD)
    sums.crossJoin(totals).select(
      col("vocab_size"), col("total_tokens"),
      // double ratio, not long·1e6 (which wraps past ~9.2e12 tokens);
      // same IEEE expression shape in the oracle
      floor(col("top_freq").cast("double") /
        col("total_tokens").cast("double") * lit(1e6)).cast("long")
        .as("topv_coverage_ppm"),
      round(slope, 6).as("zipf_slope"),
      round((syD - slope * sxD) / nD / 1e6, 6).as("zipf_intercept"))
  }

  /** Corpus snapshot diff — the dataset-versioning report (what changed
    * between two corpus builds): per doc_id, `added` (new only),
    * `removed` (old only), `changed` (both, different content hash),
    * `unchanged` — rolled up to (status, n_docs) counts. One full-outer
    * equi-join on doc_id comparing 16-byte md5 digests (text never
    * shuffles beyond its own doc_id move), then a 4-row aggregate —
    * two compact shuffles at any scale. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("h_old"))
    val n = newDocs.select(col("doc_id"), md5(col("text")).as("h_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(when(col("h_old").isNull, "added")
        .when(col("h_new").isNull, "removed")
        .when(col("h_old") =!= col("h_new"), "changed")
        .otherwise("unchanged").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
  }

  /** The fixture snapshot split shared by the corpus_diff and
    * vocab_drift queries AND their corpus-scale bench entries: old =
    * ids not ending in 9; new = ids not ending in 4, with every id
    * ending in 3 rewritten — exercises all four diff statuses. The two
    * oracle SQL bodies hardcode the same split; change all of them
    * together. */
  private[graft] def snapshotSplit(docs: DataFrame): (DataFrame, DataFrame) = {
    val old = docs.filter(col("doc_id") % 10 =!= 9)
    val neu = docs.filter(col("doc_id") % 10 =!= 4).withColumn("text",
      when(col("doc_id") % 10 === 3, concat(col("text"), lit(" v2")))
        .otherwise(col("text")))
    (old, neu)
  }

  /** Token-distribution drift between two corpus snapshots — the
    * monitoring companion to [[corpusDiff]] (a build can keep every
    * doc_id yet silently shift WHAT the tokens say): smoothed KL
    * divergence KL(new ‖ old) over the combined top-`topV` vocabulary
    * plus one OOV bucket, add-1 smoothing with a FIXED topV+1 slot
    * count so the estimate is parameter-deterministic. Emits one row
    * (n_tokens_old, n_tokens_new, vocab_old, vocab_new, kl_nano).
    *
    * Scale shape: two map-side-combined vocabulary aggregates and one
    * vocab-keyed full-outer join (the only corpus-sized shuffle — the
    * txt_vocab_topk shape); the top frame is LIMIT-bounded with a
    * total order ((c_o+c_n) desc, token), totals ride as a one-row
    * broadcast, and every KL term quantizes to integer nano-units
    * BEFORE summation (associative longs — partition-order-free, the
    * zipfProfile discipline; the per-term double expression shape is
    * identical in the oracle). */
  def vocabDrift(oldDocs: DataFrame, newDocs: DataFrame,
                 topV: Int = 1000): DataFrame = {
    require(topV >= 1)
    val K = topV + 1
    def vocab(d: DataFrame) = d.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val vo = vocab(oldDocs)
    val vn = vocab(newDocs)
    val joined = vo.withColumnRenamed("c", "c_o")
      .join(vn.withColumnRenamed("c", "c_n"), Seq("w"), "full_outer")
      .na.fill(0L, Seq("c_o", "c_n"))
    val top = joined.orderBy((col("c_o") + col("c_n")).desc, col("w")).limit(topV)
    val totals = vo.agg(sum("c").as("n_o"), count(lit(1)).as("v_o"))
      .crossJoin(vn.agg(sum("c").as("n_n"), count(lit(1)).as("v_n")))
    def termSql(cn: String, co: String) =
      s"""CAST(round(((CAST($cn + 1 AS DOUBLE) / CAST(n_n + $K AS DOUBLE)) *
         | ln((CAST($cn + 1 AS DOUBLE) * CAST(n_o + $K AS DOUBLE)) /
         |    (CAST($co + 1 AS DOUBLE) * CAST(n_n + $K AS DOUBLE)))) * 1e9) AS BIGINT)"""
        .stripMargin
    val topAgg = top.crossJoin(broadcast(totals))
      .agg(sum(expr(termSql("c_n", "c_o"))).as("kl_top_nano"),
        sum("c_o").as("top_c_o"), sum("c_n").as("top_c_n"))
    totals.crossJoin(topAgg).select(
      col("n_o").as("n_tokens_old"), col("n_n").as("n_tokens_new"),
      col("v_o").as("vocab_old"), col("v_n").as("vocab_new"),
      (col("kl_top_nano") +
        expr(termSql("n_n - top_c_n", "n_o - top_c_o"))).as("kl_nano"))
  }

  /** The four explicit ASCII character classes, spelled identically in
    * Java regex and RE2 (classes of single code points, not runs, so
    * the counts sum to length exactly). */
  private val charClasses = Seq(
    "letter" -> "[A-Za-z]", "digit" -> "[0-9]",
    "space" -> "[ \\t\\n\\r]", "punct" -> "[!-/:-@\\[-`{-~]")

  /** The ppm CASE formula shared by [[charClassProfile]] and
    * [[letterPpmExpr]] — ONE spelling of the zero-length sentinel and
    * the BIGINT-promoted `div`, so the two can never drift apart. */
  private def ppmSql(cnt: String, len: String): String =
    s"CASE WHEN $len = 0 THEN 0L ELSE (($cnt) * 1000000) div $len END"

  /** The alphabetic share as a composable Column over `text` —
    * bit-identical to [[charClassProfile]]'s `letter_ppm` (the letter
    * class carries no regex escapes, so the SQL-string form is safe
    * here where the punctuation class is not); the CCNet-style
    * "alphabetic ratio" gate stage for streaming ingest. */
  def letterPpmExpr: Column = expr(ppmSql(
    "CAST(regexp_count(text, '[A-Za-z]') AS BIGINT)", "length(text)"))

  /** Per-document character-class profile — the script/charset signal
    * CCNet/Dolma-style curation filters on (drop pages whose alphabetic
    * share collapses, route by digit/punctuation density): fractions of
    * ASCII letters, digits, whitespace, ASCII punctuation, and
    * everything else, in exact ppm over the code-point count. Character
    * CLASSES (one code point each), not runs, so the per-class counts
    * sum to length exactly (spec-pinned); the explicit ASCII classes
    * are spelled identically in Java regex and RE2, so the oracle
    * replays them verbatim. Map-only, zero exchanges. */
  def charClassProfile(docs: DataFrame): DataFrame = {
    // patterns ride as lit() columns, NOT SQL string literals — the
    // SQL parser strips the \[ escape Java's class syntax requires,
    // while DuckDB's literal keeps it (standard SQL): one Scala string
    // serves both engines only if it bypasses Spark's SQL parser.
    // Counts promote to BIGINT before the ppm multiply (an int count
    // times 1e6 wraps at ~2k-char documents under ANSI); the division
    // runs over NAMED count columns so the exact `div` form applies.
    val counted = docs.select(Seq(col("doc_id"),
      length(col("text")).cast("long").as("n_chars")) ++
      charClasses.map { case (name, cls) =>
        regexp_count(col("text"), lit(cls)).cast("long").as(s"${name}_cnt")
      }: _*)
    val otherCnt =
      s"(n_chars - ${charClasses.map(c => s"${c._1}_cnt").mkString(" - ")})"
    counted.select(Seq(col("doc_id"), col("n_chars")) ++
      charClasses.map { case (name, _) =>
        expr(ppmSql(s"${name}_cnt", "n_chars")).as(s"${name}_ppm")
      } :+ expr(ppmSql(otherCnt, "n_chars")).as("other_ppm"): _*)
  }

  /** Corpus percentile report: p5/p25/p50/p75/p95 of the token-count
    * and mean-word-length signals in long (signal, q_pct, value) form —
    * the distribution readout data-quality dashboards publish next to
    * the funnel. All TEN cells ride ONE
    * [[graft.ops.Scale.exactQuantileGrid]] call: exact quantiles at
    * bounded driver memory, every cell sharing the same three
    * distributed scans (count, sketch, bracket-count). Values quantize
    * 1e-6 — both engines convex-combine the same two neighboring
    * order statistics, but the interpolation's last-ulp shape differs
    * (Spark percentile's two-product form vs quantile_cont), the
    * established cross-engine discipline. */
  def corpusPercentiles(docs: DataFrame): DataFrame = {
    val sig = docs.select(
      wsTokenCount("text").cast("long").as("n_tokens"),
      round((length(col("text")) - (wsTokenCount("text") - 1)).cast("double") /
        wsTokenCount("text"), 6).as("mean_word_len"))
    val qs = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    val grid = graft.ops.Scale.exactQuantileGrid(
      sig, Seq("n_tokens", "mean_word_len"), qs)
    val spark = docs.sparkSession
    import spark.implicits._
    grid.toSeq.map { case ((c, q), v) =>
      (c, math.round(q * 100).toInt,
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(x => (x._1, x._2)).toDF("signal", "q_pct", "value")
  }

  /** Flesch readability signals (Flesch 1948; Kincaid et al. 1975) —
    * the classic surface-statistics quality scores many curation
    * stacks report next to the Gopher/C4 heuristics: reading ease
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) and
    * the FK grade 0.39·(w/s) + 11.8·(sy/w) − 15.59. Sentences count
    * as terminal-punctuation runs ([.!?]+, min 1); syllables as vowel
    * runs ([aeiouy]+ over the lowercased text, min 1) — the standard
    * dictionary-free approximation (a vowel run cannot span the
    * non-vowel space, so the whole-text count equals the per-word
    * sum). Both regexes are RE2-portable; the ratio expressions keep
    * one fixed double shape mirrored by the oracle, rounded 1e-6.
    * Map-only, zero exchanges. */
  def readability(docs: DataFrame): DataFrame = {
    val w = col("n_words").cast("double")
    val s = col("n_sentences").cast("double")
    val sy = col("n_syllables").cast("double")
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        greatest(expr("regexp_count(text, '[.!?]+')"), lit(1)).cast("long")
          .as("n_sentences"),
        greatest(expr("regexp_count(lower(text), '[aeiouy]+')"), lit(1)).cast("long")
          .as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
        round(lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (sy / w), 6)
          .as("flesch_ease"),
        round(lit(0.39) * (w / s) + lit(11.8) * (sy / w) - lit(15.59), 6)
          .as("fk_grade"))
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990):
    * every adjacent word pair occurring ≥ `minCount` times, scored
    * PMI = ln( p(w1 w2) / (p(w1)·p(w2)) ) with p from corpus counts —
    * the standard collocation/phrase-mining report (word2vec's phrase
    * pass, Mikolov et al. 2013 §4, is this signal with a discount).
    * Emits every qualifying pair (w1, w2, n_pair, pmi) with NO top-k
    * cut: a LIMIT ordered by the float score would make the boundary
    * rank engine-sensitive, while the ≥ minCount set is exact (the
    * Zipf tail bounds it — pairs repeating ≥ 5× are rare).
    *
    * Scale shape: ONE bigram aggregate (map-side combined, output
    * bounded by the distinct-bigram vocabulary) filtered to ≥ minCount
    * BEFORE anything joins — the qualifying set is small by Zipf, so
    * it broadcasts onto the unigram vocabulary for both count lookups
    * (the corpus-side vocab never shuffles on a pair key); N and B come
    * from one cheap per-doc aggregate. Cross-engine exactness: counts
    * are exact longs; the PMI ratio is built with one fixed
    * double-expression shape (identical in the oracle) and rounded
    * 1e-6 — the zipfProfile discipline. */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    require(minCount >= 1)
    val toks = docs.select(split(col("text"), " ").as("toks"))
    // N (token instances) and B (bigram instances) in one scan, no shuffle
    val totals = toks.agg(
      sum(size(col("toks"))).cast("long").as("n_toks"),
      sum(greatest(size(col("toks")) - 1, lit(0))).cast("long").as("n_bigrams"))
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // CASE-guarded: sequence(1, 0) DESCENDS in Spark, so a 1-token doc
    // would index past the array (the dupFracSql guard)
    val pairs = toks.select(explode(expr(
        """CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1),
          |  i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))
          |ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) END"""
          .stripMargin)).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    // the ≥ minCount pair set is Zipf-bounded: broadcast it through both
    // vocabulary lookups so the (large) vocab table never re-shuffles
    val withC1 = broadcast(pairs)
      .join(vocab.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
    val withC2 = broadcast(withC1)
      .join(vocab.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
    withC2.crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("n_pair"),
        round(log(
          (col("n_pair").cast("double") * col("n_toks").cast("double") *
            col("n_toks").cast("double")) /
          (col("n_bigrams").cast("double") * col("c1").cast("double") *
            col("c2").cast("double"))), 6).as("pmi"))
  }

  /** Heaps-law vocabulary-growth profile (Heaps 1978): the OLS fit of
    * ln(cumulative vocabulary) against ln(cumulative tokens) sampled at
    * every document boundary in doc_id order — natural corpora run
    * V(n) ≈ K·n^β with β ≈ 0.4–0.6; a flattening β flags a corpus that
    * has stopped contributing new types (heavy duplication), the
    * companion sanity report to [[zipfProfile]]. One row out:
    * (total_tokens, vocab_size, heaps_beta, heaps_logk).
    *
    * Scale shape: a token's contribution point is its corpus-FIRST
    * document — `min(doc_id)` per type (one map-side-combined
    * aggregate; no global position numbering needed since doc_id order
    * IS the corpus order) — then new-type counts roll up per document
    * and the two cumulative series run as ONE partition-parallel
    * prefix-sum pass ([[graft.ops.Stitch]]-style chunked cumsum over
    * the compact per-doc frame, no single-partition window); the OLS
    * sums are micro-unit integer logs combined in doubles (the
    * zipfProfile overflow discipline). */
  def heapsProfile(docs: DataFrame): DataFrame = {
    // every doc contributes ≥1 "token" under the split contract (an
    // empty text splits to one empty-string type), matching the explode
    // side exactly so the two series stay consistent
    val perDoc = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks"))
    val firstDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("new_types"))
    val series = perDoc.join(firstDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("new_types"))
    val chunk = (col("doc_id") / 256L).cast("long")
    val ord = Seq(col("doc_id"))
    val points = graft.ops.Stitch.globalCumsum(
        graft.ops.Stitch.globalCumsum(series, chunk, ord, col("n_toks"), "ct"),
        chunk, ord, col("new_types"), "cv")
      .filter(col("ct") >= 1L && col("cv") >= 1L)
      .select(
        round(log(col("ct").cast("double")) * 1e6).cast("long").as("xq"),
        round(log(col("cv").cast("double")) * 1e6).cast("long").as("yq"))
    // unlike zipfProfile's topV-bounded sums, these run over EVERY doc
    // point: micro-log products summed as longs wrap around ~1e4 docs
    // short of nothing but around 1e9 docs for real — DECIMAL(38,0)
    // keeps the sums exact and partition-order-free (the kmeans‖ cost
    // discipline); DuckDB's HUGEINT sums are the exact mirror
    val sums = points.agg(
      count(lit(1)).as("n"),
      sum(col("xq").cast("decimal(38,0)")).as("sx"),
      sum(col("yq").cast("decimal(38,0)")).as("sy"),
      sum((col("xq") * col("yq")).cast("decimal(38,0)")).as("sxy"),
      sum((col("xq") * col("xq")).cast("decimal(38,0)")).as("sxx"))
    val totals = perDoc.agg(sum(col("n_toks")).as("total_tokens"))
      .crossJoin(firstDoc.agg(sum(col("new_types")).as("vocab_size")))
    val nD = col("n").cast("double"); val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double"); val sxyD = col("sxy").cast("double")
    val sxxD = col("sxx").cast("double")
    val slope = (nD * sxyD - sxD * syD) / (nD * sxxD - sxD * sxD)
    // < 2 points (single-doc corpus): the OLS denominator is exactly 0
    // — emit NULL in BOTH engines (Spark would say NaN, DuckDB NULL;
    // the oracle carries the same guard)
    sums.crossJoin(totals).select(
      col("total_tokens"), col("vocab_size"),
      when(col("n") < 2, lit(null).cast("double"))
        .otherwise(round(slope, 6)).as("heaps_beta"),
      when(col("n") < 2, lit(null).cast("double"))
        .otherwise(round((syD - slope * sxD) / nD / 1e6, 6)).as("heaps_logk"))
  }

  /** The blocklist keep verdict as a composable Column over `text` —
    * plugs into [[corpusClean]]'s `extraFilter` (and any filter chain)
    * so the batch pipeline gains the badword gate without a new stage;
    * bit-identical to [[blocklistFilter]]'s `kept` and the streaming
    * gate's verdict (one shared automaton expression). */
  def blocklistKeep(phrases: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.BlocklistStats(
        org.apache.spark.sql.GraftBridge.expression(col("text")), phrases))
      .getItem(0) === 0

  /** Span-level blocklist matches — (doc_id, phrase, pos) for EVERY
    * (overlapping) occurrence, pos the 1-based code-point start in the
    * lowercased text: the attribute-span form Dolma-style taggers emit
    * (match positions recorded next to the doc, verdicts applied
    * downstream) rather than [[blocklistFilter]]'s per-doc verdict.
    * Same one-pass automaton ([[graft.functions.BlocklistSpans]]),
    * map-only + a row-local explode bounded by the per-doc hit count —
    * zero exchanges (BlocklistSpec pins the plan). */
  def blocklistSpans(docs: DataFrame, phrases: Seq[String]): DataFrame = {
    val spansCol = org.apache.spark.sql.GraftBridge.column(
      graft.functions.BlocklistSpans(
        org.apache.spark.sql.GraftBridge.expression(col("text")), phrases))
    val phArr = array(phrases.map(lit): _*)
    docs.select(col("doc_id"), explode(spansCol).as("m"))
      .select(col("doc_id"),
        element_at(phArr, col("m.ph") + 1).as("phrase"),
        col("m.pos").as("pos"))
  }

  /** Blocklist redaction — the lowercased text with every maximal run
    * of match-covered characters replaced by ONE `placeholder`
    * (overlapping/abutting matches merge; the PiiQueries redaction
    * discipline, at phrase-list scale). Output is lowercase by
    * construction: matching runs on the lowercased bytes, where İ-style
    * case folds shift offsets against the original. Map-only, one
    * automaton pass per row ([[graft.functions.BlocklistRedact]]). */
  def blocklistRedact(docs: DataFrame, phrases: Seq[String],
                      placeholder: String = "<blocked>"): DataFrame =
    docs.select(col("doc_id"),
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.BlocklistRedact(
          org.apache.spark.sql.GraftBridge.expression(col("text")),
          phrases, placeholder)).as("clean_text"))

  /** (doc_id, n_grams, fps) winnow CTE chain shared by the winnow
    * oracles (word-3-gram hashes, window 4 — the query defaults);
    * terminal CTE `f` exposes (doc_id, n_grams, fps). */
  private def winnowFpsOracleCtes: String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |h AS (SELECT doc_id, list_transform(
       |        list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
       |          i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])),
       |        g -> ${phashSql("g")}) AS hashes
       |      FROM t),
       |f AS (SELECT doc_id, len(hashes) AS n_grams,
       |        CASE WHEN len(hashes) = 0 THEN CAST([] AS BIGINT[])
       |        ELSE list_distinct(list_transform(
       |          range(1, greatest(len(hashes) - 3, 1) + 1),
       |          i -> list_min(list_slice(hashes, CAST(i AS INT), CAST(i + 3 AS INT))))) END AS fps
       |      FROM h)""".stripMargin

  /** (doc_id, n_grams, fps) winnowed-fingerprint frame both winnow
    * queries derive from. */
  private def winnowFrame(docs: DataFrame, k: Int, w: Int): DataFrame = {
    require(k >= 2 && w >= 1, s"need k >= 2, w >= 1, got k=$k w=$w")
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hashes", expr(
        s"transform(${ngramArrayExpr(k)}, g -> ${phashFrag("g")})"))
      .select(col("doc_id"), size(col("hashes")).cast("long").as("n_grams"),
        expr(
          s"""CASE WHEN size(hashes) = 0 THEN CAST(array() AS ARRAY<BIGINT>)
             |ELSE array_distinct(transform(
             |  sequence(1, greatest(size(hashes) - $w + 1, 1)),
             |  i -> array_min(slice(hashes, i, $w)))) END""".stripMargin).as("fps"))
  }

  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    winnowFrame(docs, k, w)
      .select(col("doc_id"), col("n_grams"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        md5(expr("concat_ws(' ', transform(array_sort(fps), x -> cast(x as string)))"))
          .as("fp_hash"))

  /** Cross-document winnowing match: candidate near-dup pairs sharing
    * at least `minShared` selected fingerprints — the MOSS match step.
    * By the winnowing guarantee every pair sharing a run of
    * ≥ w + k − 1 tokens appears with n_shared ≥ 1; `minShared` is the
    * precision knob. Emits (d1, d2, n_shared), d1 < d2.
    *
    * Scale shape: the [[lshPairs]] bucket-join shape on the fingerprint
    * key — candidates meet in equi-join buckets, never all-pairs — via
    * [[graft.ops.Scale.selfPairs]], so a degenerate fingerprint (shared
    * boilerplate) detects as a hot key and salts into a triangle join
    * instead of one quadratic bucket. Only compact (fp, doc_id) longs
    * shuffle.
    */
  def winnowPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
                  minShared: Int = 2): DataFrame = {
    // Materialize the fingerprint arrays ONCE before exploding into the
    // self-join, at the ARRAY level specifically: selfPairs consumes
    // its input from five subtrees (skew-detection aggregate + both
    // cold and hot sides), and when `fps` reaches a projection that
    // references it only once (the explode), CollapseProject inlines
    // the whole window-min/hash chain — including the per-lambda
    // re-evaluation of `toks`/`hashes` the multi-reference guard
    // normally blocks — multiplying the per-row cost ~60× (measured
    // 262 s vs 4 s at 200k docs). Checkpointing (doc_id, fps) keeps
    // every upstream alias multiply-referenced (linear evaluation, the
    // txt_winnow shape) and hands the join compact materialized longs —
    // the same rows it would shuffle anyway, linear in corpus size.
    val fps = winnowFrame(docs, k, w)
      .select(col("doc_id"), col("fps"))
      .localCheckpoint()
      .select(col("doc_id"), explode(col("fps")).as("fp"))
    graft.ops.Scale.selfPairs(fps, Seq("fp"), "doc_id")
      .groupBy("doc_id_1", "doc_id_2")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id_1").as("d1"), col("doc_id_2").as("d2"), col("n_shared"))
  }

  /** Edit-distance-verified near-duplicate pairs — the candidate-then-
    * verify fuzzy-dedup shape with EXACT Levenshtein similarity as the
    * verifier (the verification stage MOSS-style fingerprint matchers
    * hand off to; cf. Schleimer et al. 2003 §5's "confirm matches").
    * Candidates come from [[winnowPairs]] (every pair sharing a run of
    * ≥ w+k−1 tokens is guaranteed present); each candidate then pays
    * one exact `levenshtein` over the two texts, and pairs keep when
    * sim_ppm = (maxlen − dist)·1e6 div maxlen ≥ `minSimPpm`. All
    * arithmetic is exact integers — no float drift against the oracle.
    *
    * Scale shape: the quadratic edit-distance cost is paid ONLY on the
    * candidate pairs (bounded by the fingerprint buckets, skew-salted
    * via [[graft.ops.Scale.selfPairs]]), never all-pairs; the two text
    * lookups are equi-joins on doc_id, shuffling only candidate-side
    * rows against the corpus. Note the TEXT-MOTION cost this implies:
    * unlike the fingerprint-only stages, verification must ship BOTH
    * full texts to the candidate pair's reducer — ~2·|text| bytes per
    * candidate through the two doc_id joins. That is inherent to exact
    * Levenshtein (the verifier reads the texts) and candidate-bounded,
    * but under pathological template duplication (one boilerplate
    * shared by n docs → n²/2 identical-text candidates) the shuffled
    * text volume is quadratic in the clique size even though each
    * verification settles on the byte-equality short-circuit.
    * `maxPairsPerDoc` bounds that fan-in: each d1 keeps only its
    * `maxPairsPerDoc` strongest candidates (n_shared desc, d2 asc —
    * deterministic), capping per-doc text motion at cap·|text|; 0
    * (default) = unbounded, the oracle-exact configuration. Emits
    * (d1, d2, n_shared, dist, sim_ppm).
    */
  def editDistPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
                    minShared: Int = 2, minSimPpm: Long = 500000L,
                    maxPairsPerDoc: Int = 0): DataFrame = {
    val cand0 = winnowPairs(docs, k, w, minShared)
    val cand =
      if (maxPairsPerDoc <= 0) cand0
      else {
        import org.apache.spark.sql.expressions.Window
        val w1 = Window.partitionBy("d1")
          .orderBy(col("n_shared").desc, col("d2"))
        cand0.withColumn("_rk", row_number().over(w1))
          .filter(col("_rk") <= maxPairsPerDoc).drop("_rk")
      }
    val t1 = docs.select(col("doc_id").as("d1"), col("text").as("t1"))
    val t2 = docs.select(col("doc_id").as("d2"), col("text").as("t2"))
    levVerify(cand.join(t1, "d1").join(t2, "d2"),
      Seq("d1", "d2", "n_shared"), minSimPpm)
  }

  /** The shared Levenshtein verification tail of [[editDistPairs]] and
    * [[editDistAgainst]] — `df` must carry text columns t1/t2 plus the
    * `keyCols` to emit. Two cost levers, both semantically no-ops:
    *  - equality short-circuit: exact-duplicate cliques (the common
    *    candidate bulk — a template shared by n docs yields n²/2 pairs
    *    of IDENTICAL text) settle on a byte compare;
    *  - banded DP: sim_ppm ≥ m ⟺ dist ≤ L − ceil(m·L/1e6) =: thr, so
    *    the 3-arg levenshtein explores only the |i−j| ≤ thr band
    *    (O(L·thr), returns −1 past it) and still yields the EXACT
    *    distance for every pair that can pass the filter.
    * Emits keyCols ++ (dist, sim_ppm), filtered to sim_ppm ≥ min. */
  private def levVerify(df: DataFrame, keyCols: Seq[String],
                        minSimPpm: Long): DataFrame =
    df.withColumn("max_len",
        greatest(length(col("t1")), length(col("t2"))).cast("long"))
      .withColumn("dist", when(col("t1") === col("t2"), 0L)
        .otherwise(expr(
          s"""CAST(levenshtein(t1, t2, CAST(max_len -
             |  (($minSimPpm * max_len + 999999) div 1000000) AS INT)) AS BIGINT)"""
            .stripMargin)))
      .filter(col("dist") >= 0L)
      .select(keyCols.map(col) :+ col("dist") :+
        when(col("max_len") === 0L, 1000000L)
          .otherwise(expr("((max_len - dist) * 1000000) div max_len"))
          .as("sim_ppm"): _*)
      .filter(col("sim_ppm") >= minSimPpm)

  /** Per-row winnow fingerprint array over `text` alone — the
    * streaming-safe single-expression form of [[winnowFrame]] (toks and
    * hashes each bind ONCE via the one-element-transform idiom, so
    * nothing re-evaluates per lambda element). Bit-identical to the
    * batch frame's fps — StreamingSpec pins the parity. */
  private[graft] def winnowFpsExpr(k: Int, w: Int): Column = {
    require(k >= 2 && w >= 1, s"need k >= 2, w >= 1, got k=$k w=$w")
    expr(
      s"""element_at(transform(array(split(text, ' ')), toks ->
         |  element_at(transform(array(transform(${ngramArrayExpr(k)},
         |      g -> ${phashFrag("g")})), hashes ->
         |    CASE WHEN size(hashes) = 0 THEN CAST(array() AS ARRAY<BIGINT>)
         |    ELSE array_distinct(transform(
         |      sequence(1, greatest(size(hashes) - $w + 1, 1)),
         |      i -> array_min(slice(hashes, i, $w)))) END), 1)), 1)""".stripMargin)
  }

  /** Persistable winnow-fingerprint index of a corpus — the winnowing
    * member of the incremental-dedup index family (next to
    * `bandSignatures`, `bloomBuild`, `substringIndex`, `simhashIndex`,
    * `corpusIndex`): compact (fp, dup_of) rows, one per selected
    * fingerprint (array_distinct per doc, so rows are unique). Write
    * bucketed by `fp` and the per-batch probe join's static side
    * carries no Exchange (the sorted/bucketed corpus-writer
    * discipline). */
  def winnowIndex(corpus: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    // materialize BEFORE the explode: fps referenced once lets
    // CollapseProject inline the whole window-min/hash chain per
    // element (~60× per-row cost — the winnowPairs lesson; this path
    // measured >10 min vs seconds at 2M docs without it)
    graft.ops.Scale.materializeCompact(
        winnowFrame(corpus, k, w).select(col("doc_id"), col("fps")))
      .select(col("doc_id").as("dup_of"), explode(col("fps")).as("fp"))

  /** Incremental winnow dedup: each batch document's BEST corpus match
    * by shared selected-fingerprint count (ties → min dup_of) —
    * (batch_id, dup_of, n_shared, n_fps), the local-fingerprinting
    * member of the incremental family, mirroring `simhashDedupAgainst`'s
    * contract. By the winnowing guarantee (Schleimer et al. 2003 §4) a
    * batch doc sharing a ≥ w+k−1-token run with a corpus doc always
    * surfaces with n_shared ≥ 1; `minShared` is the precision knob and
    * n_shared/n_fps the caller's containment score.
    *
    * Scale shape: the corpus contributes only its compact index, never
    * text; candidates meet on the `fp` equi-join, so per-batch-doc
    * fan-out is bounded by the document frequency of its fingerprints
    * (window-min hashes of k-grams — far rarer than raw tokens; a
    * corpus-wide boilerplate fingerprint is exactly what
    * [[scrubFrequentNgrams]] removes upstream). */
  def winnowDedupAgainst(batch: DataFrame, corpus: DataFrame,
                         k: Int = 3, w: Int = 4, minShared: Long = 1,
                         corpusIndex: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cIdx = corpusIndex.getOrElse(winnowIndex(corpus, k, w))
    val bf = winnowFrame(batch, k, w)
      .select(col("doc_id"), col("fps")).localCheckpoint()
      .select(col("doc_id").as("batch_id"),
        size(col("fps")).cast("long").as("n_fps"), explode(col("fps")).as("fp"))
    val best = Window.partitionBy("batch_id")
      .orderBy(col("n_shared").desc, col("dup_of"))
    bf.join(cIdx, Seq("fp"))
      .groupBy("batch_id", "dup_of")
      .agg(count(lit(1)).as("n_shared"), max(col("n_fps")).as("n_fps"))
      .filter(col("n_shared") >= minShared)
      .withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
      .select(col("batch_id"), col("dup_of"), col("n_shared"), col("n_fps"))
  }

  /** Incremental edit-distance dedup: [[winnowDedupAgainst]]'s best
    * corpus match per batch document, VERIFIED by exact Levenshtein —
    * the candidate-then-verify shape of [[editDistPairs]] under the
    * incremental contract (the corpus contributes its compact winnow
    * index for candidate generation; only the ≤1-per-batch-doc matched
    * rows ever join corpus TEXT, one doc_id equi-join). Same integer
    * sim_ppm verdict and identical-text short-circuit. Emits
    * (batch_id, dup_of, n_shared, dist, sim_ppm) for verified matches.
    */
  def editDistAgainst(batch: DataFrame, corpus: DataFrame,
                      k: Int = 3, w: Int = 4, minSimPpm: Long = 500000L,
                      corpusIndex: Option[DataFrame] = None): DataFrame = {
    val cand = winnowDedupAgainst(batch, corpus, k, w, corpusIndex = corpusIndex)
    val bt = batch.select(col("doc_id").as("batch_id"), col("text").as("t1"))
    val ct = corpus.select(col("doc_id").as("dup_of"), col("text").as("t2"))
    levVerify(cand.join(bt, "batch_id").join(ct, "dup_of"),
      Seq("batch_id", "dup_of", "n_shared"), minSimPpm)
  }

  /** Content-defined-chunking fingerprints ([[graft.functions.CdcChunks]]
    * — gear-CDC in the FastCDC family, Xia et al. 2016): per-document
    * chunk identity hashes over the raw bytes. The byte-level member of
    * the dedup family — tokenizer-free, so the same operator fingerprints
    * the multimodal BINARY payloads ([[cdcFingerprintsCol]]). Emits
    * (doc_id, n_bytes, n_chunks, cdc_hash) with cdc_hash the md5 of the
    * sorted chunk-hash stream (the [[winnowFingerprints]] contract).
    *
    * Map-only, zero exchanges; rows-only at the driver gate (the gear
    * table lookup is not expressible in DuckDB SQL — the deflate
    * precedent), determinism + boundary-locality pinned in CdcSpec. */
  def cdcFingerprints(docs: DataFrame, maskBits: Int = 6, minSize: Int = 16,
                      maxSize: Int = 256): DataFrame =
    cdcFingerprintsCol(docs, encode(col("text"), "UTF-8"), maskBits, minSize, maxSize)

  /** [[cdcFingerprints]] over an arbitrary byte-bearing column (string
    * or binary) — the multimodal-payload entry point. */
  def cdcFingerprintsCol(df: DataFrame, payload: Column, maskBits: Int = 6,
                         minSize: Int = 16, maxSize: Int = 256): DataFrame =
    df
      .withColumn("chunks", cdcChunksCol(payload, maskBits, minSize, maxSize))
      .select(col("doc_id"),
        length(payload).cast("long").as("n_bytes"),
        size(col("chunks")).cast("long").as("n_chunks"),
        md5(expr("concat_ws(' ', transform(array_sort(chunks), x -> cast(x as string)))"))
          .as("cdc_hash"))

  /** The `cdc_chunks` expression as a Column. */
  def cdcChunksCol(payload: Column, maskBits: Int = 6, minSize: Int = 16,
                   maxSize: Int = 256): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.CdcChunks(
        org.apache.spark.sql.GraftBridge.expression(payload),
        maskBits, minSize, maxSize))

  /** Cross-document CDC match: candidate near-identical pairs sharing
    * at least `minShared` distinct chunk hashes, with the shared-chunk
    * containment fraction n_shared / min(n1, n2) — the storage-dedup
    * signal (two blobs assembled largely from the same byte runs),
    * position-robust because CDC boundaries move with the content.
    * Emits (d1, d2, n_shared, containment), d1 < d2.
    *
    * Scale shape: the [[winnowPairs]] plan — fingerprint arrays
    * checkpoint ONCE (multi-consumer guard), candidates meet in
    * [[graft.ops.Scale.selfPairs]] equi-join buckets with hot-key
    * salting, only compact (hash, doc_id) longs shuffle; the per-doc
    * distinct-chunk counts re-attach onto the (much smaller) pair
    * aggregate by doc_id join. */
  def cdcPairs(docs: DataFrame, maskBits: Int = 6, minSize: Int = 16,
               maxSize: Int = 256, minShared: Int = 2): DataFrame = {
    val fps = docs
      .select(col("doc_id"),
        array_distinct(cdcChunksCol(encode(col("text"), "UTF-8"),
          maskBits, minSize, maxSize)).as("chunks"))
      .localCheckpoint()
    val sizes = fps.select(col("doc_id"), size(col("chunks")).as("n"))
    val exploded = fps.select(col("doc_id"), explode(col("chunks")).as("ch"))
    graft.ops.Scale.selfPairs(exploded, Seq("ch"), "doc_id")
      .groupBy("doc_id_1", "doc_id_2")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      // per-doc counts attach per side — auto-broadcast at test scale,
      // doc_id-keyed sort-merge at corpus scale (counts are one row per
      // doc: NOT broadcastable by construction at 100 TB)
      .join(sizes.as("s1"), col("doc_id_1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("doc_id_2") === col("s2.doc_id"))
      .select(col("doc_id_1").as("d1"), col("doc_id_2").as("d2"),
        col("n_shared"),
        round(col("n_shared").cast("double") /
          least(col("s1.n"), col("s2.n")).cast("double"), 6).as("containment"))
  }

  /** The unigram LM folded into ONE row: (uni_map MAP<STRING,BIGINT>,
    * tot DOUBLE) — the broadcastable artifact a stateless streaming
    * perplexity gate scores per-row against
    * ([[graft.streaming.StreamOps.streamingPerplexityGate]]). Bounded
    * at `topV` entries when given (REQUIRED at web scale: the untruncated
    * vocabulary is unbounded); evicted and unseen tokens score through
    * the `oovCount` pseudo-count, exactly as [[unigramScore]]'s topV
    * path does. */
  def unigramModelRow(docs: DataFrame, topV: Option[Int] = None): DataFrame =
    truncVocab(unigramVocab(docs), topV)
      .agg(map_from_arrays(collect_list(col("tok")), collect_list(col("cnt")))
        .as("uni_map"))
      .crossJoin(broadcast(unigramNormalizer(docs)))

  /** The interpolated-bigram-Kneser-Ney model folded into ONE row for
    * streaming broadcast: `bg_map` (bigram counts), `lc_map` (left
    * context counts c(w'·)), `cl_map` (left continuation types
    * N1+(w'·)), `cr_map` (right continuation types N1+(·w)), `n_types`
    * — the exact tables [[kneserNeyScore]] derives, each from the same
    * ONE counting pass, collapsed to maps. `topV` bounds every map by
    * construction and is REQUIRED at web scale (the bigram type
    * inventory is ~corpus-token-count rows unpruned). */
  def knModelRow(corpus: DataFrame, topV: Option[Int] = None): DataFrame = {
    val bc = truncTop(bigramCounts(corpus), topV, "bcnt", "bg")
    val sided = bc.select(col("bg"), col("bcnt"),
      element_at(split(col("bg"), " "), 1).as("lw"),
      element_at(split(col("bg"), " "), 2).as("rw"))
    val bgMap = bc.agg(map_from_arrays(
      collect_list(col("bg")), collect_list(col("bcnt"))).as("bg_map"))
    val lwMaps = sided.groupBy("lw")
      .agg(sum(col("bcnt")).as("lcnt"), count(lit(1)).as("cont_l"))
      .agg(
        map_from_arrays(collect_list(col("lw")), collect_list(col("lcnt"))).as("lc_map"),
        map_from_arrays(collect_list(col("lw")), collect_list(col("cont_l"))).as("cl_map"))
    val crMap = sided.groupBy("rw").agg(count(lit(1)).as("cont_r"))
      .agg(map_from_arrays(
        collect_list(col("rw")), collect_list(col("cont_r"))).as("cr_map"))
    val types = bc.agg(count(lit(1)).cast("double").as("n_types"))
    bgMap.crossJoin(lwMaps).crossJoin(crMap).crossJoin(types)
  }

  /** Per-row bigram-KN NLL under the one-row broadcast
    * [[knModelRow]] (`toks` + the five model columns must be bound) —
    * the fold-order twin of [[kneserNeyScore]]'s aggregate, term-for-
    * term identical arithmetic (the coalesce/greatest fallback chain
    * incl. the lambda=1 pruned-context backoff and the 0.5 unseen-word
    * pseudo-type). Parity with the batch aggregate holds up to the
    * 1e-6 quantization boundary (the [[unigramScoreExpr]] convention:
    * partition-order vs document-order partial sums). Only documents
    * with >= 2 tokens score (the batch side's composition convention). */
  def knScoreExpr(discount: Double = 0.75): Column = {
    require(discount > 0 && discount < 1, s"KN discount must be in (0,1), got $discount")
    val lw = "element_at(toks, CAST(i AS INT))"
    val rw = "element_at(toks, CAST(i AS INT) + 1)"
    round(expr(
      s"""aggregate(sequence(1, size(toks) - 1), CAST(0.0 AS DOUBLE), (acc, i) ->
         |  acc - ln(
         |    coalesce(
         |      greatest(coalesce(CAST(element_at(bg_map, concat($lw, ' ', $rw)) AS DOUBLE), CAST(0.0 AS DOUBLE)) - $discount,
         |        CAST(0.0 AS DOUBLE))
         |        / CAST(element_at(lc_map, $lw) AS DOUBLE),
         |      CAST(0.0 AS DOUBLE))
         |    + coalesce($discount * element_at(cl_map, $lw) / CAST(element_at(lc_map, $lw) AS DOUBLE),
         |        CAST(1.0 AS DOUBLE))
         |      * (coalesce(CAST(element_at(cr_map, $rw) AS DOUBLE), CAST(0.5 AS DOUBLE)) / n_types)))
         |  / CAST(size(toks) - 1 AS DOUBLE)""".stripMargin), 6)
  }

  /** Per-row unigram NLL under a one-row broadcast model (`toks`,
    * `uni_map`, `tot` must be bound) — the fold-order twin of
    * [[unigramScore]]'s aggregate. Parity with the batch aggregate
    * holds up to the 1e-6 quantization boundary, not bit-exactly: the
    * batch side's partial sums accumulate in partition order, this
    * fold in document order, so a pre-round difference of ~1 ulp on a
    * rounding tie can shift the result by one quantum. */
  def unigramScoreExpr(oovCount: Double = 0.5): Column =
    round(expr(
      s"""aggregate(toks, CAST(0.0 AS DOUBLE),
         |  (acc, t) -> acc - ln(coalesce(CAST(element_at(uni_map, t) AS DOUBLE), $oovCount) / tot))
         |  / size(toks)""".stripMargin), 6)

  /** Scrub word-n-gram spans that occur in more than `maxDf` distinct
    * documents — the token-level analogue of shared-line removal
    * (CCNet, Wenzek et al. 2020 §4.1) / exact substring deduplication
    * (Lee et al. 2022 "Deduplicating Training Data Makes Language
    * Models Better"): cross-document boilerplate is removed from every
    * document instead of dropping whole documents. Emits (doc_id,
    * n_tokens, n_removed, clean_hash) where clean_hash is the md5 of
    * the scrubbed text.
    *
    * Scale shape (100 TB):
    *  - pass 1 (doc-frequency) is the [[ngramShingles]] explode into a
    *    map-side-combined count — the frequent set (`df > maxDf`) is
    *    tiny by Zipf's law and BROADCASTS; the corpus is never
    *    shuffled on a gram key;
    *  - pass 2 explodes positional grams over a doc_id-clustered scan,
    *    joins the BROADCAST frequent set, and collects matched start
    *    positions per document — the positional fan-out never crosses
    *    the network (the repartition sits below the explode), and only
    *    MATCHED rows reach the aggregate;
    *  - pass 3 (rebuild) joins the per-doc hit lists back on doc_id and
    *    filters the token array per-row. Both doc_id shuffles move
    *    compact (doc_id, text) rows — they are separate exchanges (the
    *    optimizer's isnotnull on the build side defeats exchange
    *    reuse), so the corpus is scanned three times and shuffled
    *    twice, compactly; at test scale the rebuild join
    *    auto-broadcasts, at corpus scale it degrades gracefully to a
    *    co-partitioned sort-merge join on doc_id (both sides already
    *    clustered);
    *  - the rebuild itself is per-row array arithmetic: expand starts
    *    to covered token indices, filter the token array, re-concat.
    */
  def scrubFrequentNgrams(docs: DataFrame, n: Int = 3, maxDf: Long = 5): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val freq = ngramShingles(docs, n)
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("shingle").as("gram"))
    val gramExpr = ngramArrayExpr(n)
    val pre = docs.repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val hits = pre
      .select(col("doc_id"), posexplode(expr(gramExpr)))
      .join(broadcast(freq), col("col") === col("gram"))
      .groupBy("doc_id")
      .agg(collect_set(col("pos")).as("starts"))
    pre.join(hits, Seq("doc_id"), "left")
      .withColumn("covered", expr(
        s"array_distinct(flatten(transform(coalesce(starts, CAST(array() AS ARRAY<INT>)), p -> sequence(p, p + ${n - 1}))))"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(col("covered")).as("n_removed"),
        md5(expr("concat_ws(' ', filter(toks, (t, j) -> NOT array_contains(covered, j)))"))
          .as("clean_hash"))
  }

  /** Exact-substring deduplication at k-token window granularity (Lee
    * et al. 2021 "Deduplicating Training Data Makes Language Models
    * Better" §4.1: remove every ≥50-token span that appears verbatim
    * more than once in the corpus — within OR across documents). The
    * suffix-array construction the paper uses is replaced by the
    * distributed compromise: every k-token window is hashed, windows
    * whose hash occurs ≥2 times corpus-wide are duplicated, and a
    * document's duplicated spans are the union of its duplicated
    * windows (adjacent/overlapping windows merge into maximal spans by
    * construction). Any duplicated run of length L ≥ k is covered
    * exactly (every one of its windows repeats wherever the run
    * repeats); runs shorter than k are below the threshold by
    * definition — i.e. k IS the paper's 50-token match threshold.
    * Emits (doc_id, n_tokens, n_removed, n_spans, clean_hash): the
    * [[scrubFrequentNgrams]] output shape plus the maximal-span count,
    * clean_hash the md5 of the text with duplicated spans removed.
    *
    * Scale shape (100 TB):
    *  - pass 1 hashes every window and counts by hash: the window
    *    STRINGS (an O(k)× amplification) exist only partition-locally
    *    between the explode and the hash projection; what shuffles is
    *    the map-side-combined (hash, count) aggregate — O(corpus
    *    tokens) compact 16-byte rows, the same order of shuffle the
    *    paper's suffix-array sort pays;
    *  - pass 2 re-derives positional window hashes above the doc_id
    *    clustering and LEFT-SEMI joins the duplicated-hash set on h:
    *    the dup set is corpus-derived (NOT broadcastable — for a
    *    template clique it is Zipf-large), so this is a shuffle join of
    *    two compact keyed frames; a hyper-duplicated window (the same
    *    boilerplate in millions of docs) lands its position rows on one
    *    reducer but each row emits exactly once — bounded, no
    *    fan-out;
    *  - pass 3 joins the per-doc start lists back on doc_id (both
    *    sides doc_id-clustered) and rebuilds per-row: expand starts to
    *    covered indices, count maximal spans (a covered index whose
    *    predecessor is uncovered opens a span), filter the token
    *    array, md5.
    *  - `portableHash=false` swaps the md5-based cross-engine hash for
    *    native xxhash64 — the production configuration; md5 exists for
    *    DuckDB-oracle parity.
    */
  def exactSubstringDedup(docs: DataFrame, k: Int = 50,
                          portableHash: Boolean = true): DataFrame = {
    require(k >= 2, s"window length must be >= 2 tokens, got $k")
    val h: Column => Column = if (portableHash) phash else (c => xxhash64(c))
    val pre = docs.repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    // the count branch needs no doc_id clustering (it aggregates on h)
    // and no positions — scan → explode → hash, map-side combined
    val dup = docs
      .select(split(col("text"), " ").as("toks"))
      .select(explode(expr(ngramArrayExpr(k))).as("win"))
      .select(h(col("win")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("h")
    val starts = pre
      .select(col("doc_id"), posexplode(expr(ngramArrayExpr(k))).as(Seq("pos", "win")))
      .select(col("doc_id"), col("pos"), h(col("win")).as("h"))
      .join(dup, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(collect_set(col("pos")).as("starts"))
    scrubSpans(pre, starts, k)
  }

  /** The span-scrub rebuild all three substring-dedup forms share:
    * per-doc removed-window start lists expand to covered token
    * indices, maximal spans count where a covered index's predecessor
    * is uncovered, and the clean text hashes filtered-by-index. */
  private def scrubSpans(pre: DataFrame, starts: DataFrame, k: Int): DataFrame =
    pre.join(starts, Seq("doc_id"), "left")
      .withColumn("covered", expr(
        s"array_distinct(flatten(transform(coalesce(starts, CAST(array() AS ARRAY<INT>)), p -> sequence(p, p + ${k - 1}))))"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(col("covered")).as("n_removed"),
        size(expr("filter(covered, c -> NOT array_contains(covered, c - 1))")).as("n_spans"),
        md5(expr("concat_ws(' ', filter(toks, (t, j) -> NOT array_contains(covered, j)))"))
          .as("clean_hash"))

  /** The persistable side of incremental exact-substring dedup: the
    * DISTINCT window-hash set of the existing corpus — compact 8-byte
    * rows, one explode + map-side-combined distinct, materialized once
    * and unioned as the corpus grows (the [[corpusIndex]] discipline;
    * persist it BUCKETED by h and the per-batch probe join's static
    * side carries no exchange). */
  def substringIndex(corpus: DataFrame, k: Int = 50,
                     portableHash: Boolean = true): DataFrame = {
    require(k >= 2, s"window length must be >= 2 tokens, got $k")
    val h: Column => Column = if (portableHash) phash else (c => xxhash64(c))
    corpus
      .select(split(col("text"), " ").as("toks"))
      .select(explode(expr(ngramArrayExpr(k))).as("win"))
      .select(h(col("win")).as("h"))
      .distinct()
  }

  /** Incremental exact-substring dedup: scrub every k-token window of
    * a NEW batch that already appears in the existing corpus — the
    * span-level member of the incremental family (exact-doc =
    * [[bloomProbe]], fuzzy-doc = [[lshPairsAgainst]], embedding =
    * [[graft.sim.SimilarityQueries]] incremental ANN). A fresh crawl
    * snapshot dedupes against the training corpus at Lee et al.'s
    * granularity without re-counting the corpus: the corpus
    * contributes only its [[substringIndex]] (pre-materialized in
    * production), the batch pays one positional window pass, and the
    * probe is a left-semi equi-join on the compact hash key — batch
    * windows shuffle, the bucketed index does not. Within-batch
    * duplication is deliberately NOT scrubbed here (run
    * [[exactSubstringDedup]] on the batch for that); the two compose.
    * Output is the [[exactSubstringDedup]] contract over batch docs.
    */
  def exactSubstringDedupAgainst(batch: DataFrame, corpus: DataFrame,
                                 k: Int = 50,
                                 portableHash: Boolean = true): DataFrame = {
    require(k >= 2, s"window length must be >= 2 tokens, got $k")
    val h: Column => Column = if (portableHash) phash else (c => xxhash64(c))
    val pre = batch.repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val starts = pre
      .select(col("doc_id"), posexplode(expr(ngramArrayExpr(k))).as(Seq("pos", "win")))
      .select(col("doc_id"), col("pos"), h(col("win")).as("h"))
      .join(substringIndex(corpus, k, portableHash), Seq("h"), "left_semi")
      .groupBy("doc_id").agg(collect_set(col("pos")).as("starts"))
    scrubSpans(pre, starts, k)
  }

  /** [[exactSubstringDedup]] with keep-one semantics — the OTHER mode
    * of Lee et al. 2021's dedup tool ("remove all but one occurrence"):
    * a duplicated k-token window is scrubbed everywhere EXCEPT its
    * corpus-wide first occurrence, the occurrence with the
    * lexicographically smallest (doc_id, pos). The remove-all form
    * ([[exactSubstringDedup]]) destroys every copy of boilerplate; this
    * form preserves exactly one so the corpus keeps the content once —
    * the configuration most production pipelines run. Output contract
    * is the remove-all shape: (doc_id, n_tokens, n_removed, n_spans,
    * clean_hash).
    *
    * Scale shape (100 TB): one positional window derivation feeds both
    * branches (recomputed per consumer exactly like the remove-all
    * form's two window derivations — window strings never leave their
    * partition, only (h, doc_id, pos) rows shuffle):
    *  - the dup table adds an argmin to the count aggregate:
    *    min(struct(doc_id, pos)) per hash, partially aggregated
    *    map-side next to the count — same compact shuffle as the
    *    remove-all counting pass, 16 extra bytes per hash;
    *  - pass 2 is the same h-keyed semi-join shape, now an inner join
    *    carrying the 2-field `first` struct so each occurrence can test
    *    itself against the winner row-locally; a hyper-duplicated
    *    window still emits each occurrence exactly once;
    *  - pass 3 (rebuild) is unchanged.
    */
  def exactSubstringDedupKeep(docs: DataFrame, k: Int = 50,
                              portableHash: Boolean = true): DataFrame = {
    require(k >= 2, s"window length must be >= 2 tokens, got $k")
    val h: Column => Column = if (portableHash) phash else (c => xxhash64(c))
    val pre = docs.repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    def occ = pre
      .select(col("doc_id"), posexplode(expr(ngramArrayExpr(k))).as(Seq("pos", "win")))
      .select(col("doc_id"), col("pos"), h(col("win")).as("h"))
    val dup = occ
      .groupBy("h")
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .filter(col("c") >= 2)
      .select(col("h"), col("first"))
    val starts = occ.join(dup, Seq("h"))
      .filter(!(col("doc_id") === col("first.doc_id") &&
        col("pos") === col("first.pos")))
      .groupBy("doc_id").agg(collect_set(col("pos")).as("starts"))
    scrubSpans(pre, starts, k)
  }

  /** (word, freq) vocabulary table from the corpus — the relation BPE
    * training iterates on. The ONLY corpus-sized pass in the BPE
    * pipeline: one exploded, map-side-combined aggregate; everything
    * after runs on the vocabulary. */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** [[wordFreq]] for the sibling tokenizer ([[UnigramLm]]). */
  private[text] def wordFreqOf(docs: DataFrame): DataFrame = wordFreq(docs)

  /** First-iteration BPE pair statistics (Sennrich et al. 2016 "Neural
    * Machine Translation of Rare Words with Subword Units", Algorithm
    * 1's get_stats over the initial character vocabulary): adjacent
    * symbol-pair counts with the word-end marker `</w>` appended,
    * weighted by word frequency, top-k by (count desc, pair asc) so
    * ties are deterministic cross-engine.
    *
    * Scale: the corpus is touched once (the [[wordFreq]] aggregate);
    * pair explosion fans out over the VOCABULARY × word length, which
    * is bounded regardless of corpus size. */
  def bpePairs(docs: DataFrame, topK: Int = 50): DataFrame =
    wordFreq(docs)
      .filter(length(col("word")) >= 1)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, length(word)),
          |  i -> concat(substring(word, i, 1), ' ',
          |       CASE WHEN i = length(word) THEN '</w>'
          |            ELSE substring(word, i + 1, 1) END))""".stripMargin)).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)

  private def sqlQuote(s: String): String = s.replace("'", "''")

  /** Greedy left-to-right replacement of the adjacent symbol pair
    * (l, r) by its merged symbol, as a pure aggregate-HOF fold over the
    * symbols array — no UDF, so the merge step stays a Catalyst
    * expression. Overlaps resolve left-first ("a a a" under (a,a) →
    * "aa a"), matching the reference BPE implementation. */
  private[text] def mergePairExpr(l: String, r: String): Column = {
    val (ql, qr, qlr) = (sqlQuote(l), sqlQuote(r), sqlQuote(l + r))
    expr(
      s"""aggregate(
         |  sequence(1, size(syms)),
         |  named_struct('out', CAST(array() AS ARRAY<STRING>), 'skip', false),
         |  (st, i) -> CASE
         |    WHEN st.skip THEN named_struct('out', st.out, 'skip', false)
         |    WHEN i < size(syms) AND element_at(syms, i) = '$ql'
         |         AND element_at(syms, i + 1) = '$qr'
         |      THEN named_struct('out', concat(st.out, array('$qlr')), 'skip', true)
         |    ELSE named_struct('out', concat(st.out, array(element_at(syms, i))), 'skip', false)
         |  END,
         |  st -> st.out)""".stripMargin)
  }

  /** In-memory BPE encode of one word: repeatedly merge the
    * lowest-rank applicable pair (all its occurrences, greedy
    * left-to-right — the [[mergePairExpr]] scan) until no pair in the
    * merge table remains. Equivalent to applying the merge table in
    * rank order, at O(len²) worst case instead of O(len·|merges|). */
  private[graft] def encodeWordDriver(w: String,
                               ranks: Map[(String, String), Int],
                               initSyms: String => Seq[String] = charInitSyms)
      : Seq[String] = {
    var syms: Vector[String] = initSyms(w).toVector
    var continue = syms.length >= 2
    while (continue) {
      var best: Option[((String, String), Int)] = None
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        ranks.get(p).foreach { rk =>
          if (best.forall(_._2 > rk)) best = Some((p, rk))
        }
        i += 1
      }
      best match {
        case None => continue = false
        case Some(((l, r), _)) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
              out += (l + r); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
          continue = syms.length >= 2
      }
    }
    syms
  }

  /** Learn `numMerges` BPE merges over the corpus (Sennrich et al. 2016
    * Algorithm 1): start from the character vocabulary (+ `</w>`),
    * repeatedly count adjacent symbol pairs weighted by word frequency,
    * merge the most frequent pair (ties break lexicographically for
    * determinism). Returns the ordered merge table (rank, left, right)
    * — the artifact a tokenizer ships.
    *
    * Scale (100 TB): the corpus contributes exactly ONE pass — the
    * [[wordFreq]] aggregate — and its output is bounded by the DISTINCT
    * word vocabulary (Heaps' law: ~millions of rows even for a
    * 100 TB web corpus), not the corpus. A production merge count is
    * tens of thousands, so the loop itself must not launch per-round
    * Spark jobs: when the vocabulary fits a driver bound
    * (`maxDriverVocab` rows; ~tens of bytes per word — hundreds of MB
    * at the default 4M cap) it is collected ONCE and the classic
    * in-memory merge loop runs with incremental pair-statistics and a
    * lazy-deletion priority queue (the subword-nmt shape: each merge
    * touches only the words containing the merged pair, argmax is a
    * heap pop, zero Spark jobs per round). Only when the vocabulary
    * exceeds the bound does training fall back to the distributed
    * per-round loop ([[bpeTrainDistributed]]) — correct at any scale,
    * but one vocab-sized Spark job per merge. Both paths produce
    * identical merge tables (ties break (count desc, l, r) in each;
    * partitioning-invariance and reference-parity spec-pinned). */
  def bpeTrain(docs: DataFrame, numMerges: Int = 20,
               maxDriverVocab: Long = 4000000L): Seq[(Int, String, String)] = {
    val vocab = wordFreq(docs)
      .filter(length(col("word")) >= 1)
      .localCheckpoint()
    if (vocab.count() <= maxDriverVocab)
      bpeTrainDriver(vocab.collect().map(r => (r.getString(0), r.getLong(1))), numMerges)
    else bpeTrainDistributed(vocab, numMerges)
  }

  /** Default word → initial-symbol split: characters plus the `</w>`
    * end-of-word marker (Sennrich et al. 2016). [[ByteBpe]] substitutes
    * UTF-8 hex byte pairs with no marker (GPT-2 byte level). */
  private[text] def charInitSyms(w: String): Vector[String] =
    w.map(_.toString).toVector :+ "</w>"

  /** In-memory BPE merge loop over a collected (word, freq) vocabulary —
    * incremental pair statistics + lazy-deletion max-heap, so each round
    * is O(words containing the merged pair), not O(vocab). `initSyms`
    * picks the initial alphabet (chars+`</w>` here, UTF-8 hex bytes in
    * [[ByteBpe]]); the loop itself is alphabet-agnostic. */
  private[text] def bpeTrainDriver(vocab: Array[(String, Long)],
                             numMerges: Int,
                             initSyms: String => Seq[String] = charInitSyms)
      : Seq[(Int, String, String)] = {
    import scala.collection.mutable
    val syms: Array[mutable.ArrayBuffer[String]] = vocab.map { case (w, _) =>
      val b = mutable.ArrayBuffer.empty[String]
      initSyms(w).foreach(b += _); b
    }
    val freq: Array[Long] = vocab.map(_._2)
    val stats = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWord(wi: Int, sign: Long): Unit = {
      val s = syms(wi); val f = freq(wi) * sign
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = stats.getOrElse(p, 0L) + f
        if (c == 0L) stats.remove(p) else stats(p) = c
        if (sign > 0) where.getOrElseUpdate(p, mutable.Set.empty) += wi
        i += 1
      }
      if (sign < 0) {
        i = 0
        while (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          // drop the index only if the pair is truly gone from this word
          // (re-added below for pairs the merge keeps)
          where.get(p).foreach(_ -= wi)
          i += 1
        }
      }
    }
    syms.indices.foreach(addWord(_, 1L))
    // lazy-deletion heap ordered (count desc, l asc, r asc) — entries go
    // stale when a later merge changes the pair's count; a popped entry
    // is valid iff it matches the pair's CURRENT count
    val ord = Ordering.by[(Long, String, String), (Long, String, String)] {
      case (c, l, r) => (-c, l, r)
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord.reverse)
    stats.foreach { case ((l, r), c) => heap.enqueue((c, l, r)) }
    def mergeWord(wi: Int, l: String, r: String): Unit = {
      val s = syms(wi)
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i < s.length - 1 && s(i) == l && s(i + 1) == r) { out += (l + r); i += 2 }
        else { out += s(i); i += 1 }
      }
      addWord(wi, -1L)
      val touched = mutable.Set.empty[(String, String)]
      var j = 0
      while (j < s.length - 1) { touched += ((s(j), s(j + 1))); j += 1 }
      syms(wi) = out
      addWord(wi, 1L)
      j = 0
      while (j < out.length - 1) { touched += ((out(j), out(j + 1))); j += 1 }
      touched.foreach { p =>
        stats.get(p).foreach { c => heap.enqueue((c, p._1, p._2)) }
      }
    }
    val merges = mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 0
    while (rank < numMerges && heap.nonEmpty) {
      val (c, l, r) = heap.dequeue()
      if (stats.getOrElse((l, r), 0L) == c) {
        merges += ((rank, l, r))
        // snapshot: mergeWord mutates `where`
        where.getOrElse((l, r), mutable.Set.empty).toArray.sorted
          .foreach(mergeWord(_, l, r))
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Distributed per-round BPE merge loop — the overflow path for a
    * vocabulary too large to collect. Every iteration runs on the
    * vocabulary frame: one pair-count aggregate (vocab-sized shuffle)
    * plus ONE collected row (the argmax pair) — the same bounded
    * collect-per-round discipline as [[graft.ops.Components]], with the
    * same `localCheckpoint` lineage truncation so round R's plan does
    * not embed rounds 1..R-1. The merge rewrite itself is a pure
    * Catalyst fold ([[mergePairExpr]]), distributed per-row over the
    * vocabulary. Stops early when no adjacent pair remains. */
  /** Char+`</w>` initial-symbol expression over a `word` column — the
    * distributed twin of [[charInitSyms]]. */
  private[text] val charInitSymsExpr: Column = expr(
    "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('</w>'))")

  private[text] def bpeTrainDistributed(vocab: DataFrame,
                                        numMerges: Int,
                                        initSyms: Column = charInitSymsExpr)
      : Seq[(Int, String, String)] = {
    var words = vocab
      .withColumn("syms", initSyms)
      .select("syms", "freq")
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = words
        // slice form, not sequence(1, size-1): a fully-merged word has ONE
        // symbol, and Spark's sequence(1, 0) counts DOWN instead of
        // yielding empty — slice's greatest(…, 0) bound cannot
        .select(col("freq"), explode(expr(
          "transform(slice(syms, 1, greatest(size(syms) - 1, 0)), (s, i) -> struct(s AS l, element_at(syms, i + 2) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((rank, l, r))
        words = words.withColumn("syms", mergePairExpr(l, r)).localCheckpoint()
        rank += 1
      }
    }
    merges.toSeq
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3: score
    * every document with an LM, split the corpus into equal head /
    * middle / tail thirds by score; training recipes then mix from the
    * buckets). Scores come from [[unigramScore]] (nll ascending = most
    * fluent first), the split replicates SQL `ntile(nBuckets)` exactly:
    * bucket sizes differ by at most one, larger buckets first, ties on
    * nll break by doc_id so the assignment is deterministic
    * cross-engine ([[unigramScore]]'s 1e-6 quantization makes the sort
    * key itself engine-exact).
    *
    * Scale (100 TB): a global rank without a global sort — the rank is
    * [[graft.ops.Stitch.globalCumsum]] of 1 over nll-ordered chunks
    * (chunk = floor(nll·16): bounded cardinality — nll spans a few
    * units — and monotone in the sort key, so chunk-ascending equals
    * global order; the driver collects one count per chunk, never
    * rows). There is NO single-partition Exchange in the plan
    * (PlanSpec-pinned). The corpus count and bucket cutoffs are driver
    * literals; everything else is the unigram scoring pass plus one
    * chunk-partitioned window. */
  def perplexityBuckets(docs: DataFrame, nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"need >= 2 buckets, got $nBuckets")
    val n = docs.count()
    // globalCumsum executes its input twice (the per-chunk totals
    // collect, then the ranked output) — with the full unigram scoring
    // chain upstream that would be two corpus passes, so the scored
    // frame is materialized ONCE via localCheckpoint (the
    // bpeTrain/Components discipline; measured 29.6 → 9.1 s on the
    // 2M-doc BENCH_LARGE ppl_buckets). Not .persist(): a catalog cache of unigramScore's
    // exact plan would silently substitute into OTHER queries over the
    // same corpus (txt_unigram_lm) and change their executed plans.
    val scored = unigramScore(docs).localCheckpoint()
    val ranked = graft.ops.Stitch.globalCumsum(scored,
      chunk = floor(col("nll") * 16).cast("long"),
      ord = Seq(col("nll"), col("doc_id")),
      value = lit(1L), out = "rk")
    val q = n / nBuckets
    val r = n % nBuckets
    // ntile(nBuckets): first r buckets hold q+1 rows, the rest hold q
    val bucket =
      if (q == 0L) col("rk")
      else when(col("rk") <= lit(r * (q + 1)),
          floor((col("rk") - 1) / lit(q + 1)) + 1)
        .otherwise(lit(r) + floor((col("rk") - lit(r * (q + 1)) - 1) / lit(q)) + 1)
    val labeled = ranked
      .select(col("doc_id"), col("nll"), bucket.cast("int").as("bucket"))
    val band =
      if (nBuckets == 3)
        when(col("bucket") === 1, lit("head"))
          .when(col("bucket") === 2, lit("middle"))
          .otherwise(lit("tail"))
      else concat(lit("b"), col("bucket").cast("string"))
    labeled.withColumn("band", band)
  }

  /** Merge table learned by the bpe_encode driver query, cached so the
    * oracle SQL can embed the merges as literals (the
    * [[graft.sim.Ivf.cachedCentroids]] pattern: Verify runs queries
    * first, dumps oracle SQL after). */
  @volatile private[text] var cachedMerges: Option[Seq[(Int, String, String)]] = None

  /** Apply a learned BPE merge table to the corpus (the other half of
    * the [[bpeTrain]] → encode tokenizer loop): every document's words
    * become subword sequences, emitting per-document
    * (n_words, n_tokens, stream_hash) where stream_hash is the md5 of
    * the document's space-joined subword stream in word order — the
    * value that pins encode parity cross-engine.
    *
    * Scale (100 TB): the merges are applied to the DISTINCT-WORD
    * vocabulary, not the corpus, and the encoded vocabulary BROADCASTS
    * back onto the corpus's exploded words: the corpus-sized fan-out
    * reuses the pre-explode doc_id clustering (the [[topNgram]] idiom)
    * so it never crosses the network, and the word join is a broadcast
    * hash join, never a shuffle on the maximally-skewed word key. The
    * vocabulary encode itself mirrors [[bpeTrain]]'s two paths: when
    * the vocabulary fits the driver bound it is collected once and each
    * word encoded in memory by repeatedly applying its lowest-rank
    * applicable merge (equivalent to applying merges in rank order —
    * a merge only creates adjacencies involving its NEW symbol, so an
    * earlier-rank pair can never become newly applicable — and each
    * application is the same greedy left-to-right scan as
    * [[mergePairExpr]]); zero Spark jobs per merge. The overflow
    * fallback folds [[mergePairExpr]] over the vocabulary frame with a
    * `localCheckpoint` per round so merge R's plan does not nest rounds
    * 1..R-1's expression trees — one vocab-sized job per merge. */
  def bpeEncode(docs: DataFrame, merges: Seq[(Int, String, String)],
                maxDriverVocab: Long = 4000000L): DataFrame = {
    val spark = docs.sparkSession
    val vocab = wordFreq(docs)
      .filter(length(col("word")) >= 1)
      .select(col("word"))
      .localCheckpoint()
    val encoded =
      if (vocab.count() <= maxDriverVocab) {
        val ranks = merges.map { case (rk, l, r) => (l, r) -> rk }.toMap
        val rows = vocab.collect().map { row =>
          val w = row.getString(0)
          org.apache.spark.sql.Row(w, encodeWordDriver(w, ranks))
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("word",
              org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField("syms",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.StringType, containsNull = false),
              nullable = false))))
      } else {
        val init = vocab.withColumn("syms", expr(
          "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('</w>'))"))
        merges.sortBy(_._1).foldLeft(init) { case (df, (_, l, r)) =>
          df.withColumn("syms", mergePairExpr(l, r)).localCheckpoint()
        }
      }
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

  /** Merge table learned by the tok_fertility driver query — its own
    * cache so the fertility oracle can never silently cross with the
    * bpe_encode oracle's merges (the cachedTokenizeMerges discipline). */
  @volatile private[text] var cachedFertilityMerges: Option[Seq[(Int, String, String)]] = None

  /** Tokenizer fertility report: per-language subwords-per-word
    * (fertility) and characters-per-subword under a learned BPE merge
    * table — the standard multilingual tokenizer-quality observable
    * (a language with fertility ≫ 1.5 is being over-fragmented and
    * under-represented per training FLOP; the metric XLM-R/mT5-style
    * mixtures are tuned against). Emits one row per language:
    * (lang, n_docs, n_words, n_tokens, fertility, chars_per_token).
    *
    * Scale shape: rides [[bpeEncode]]'s audited plan (broadcast
    * vocabulary, doc_id-clustered fan-out) and joins its per-doc
    * aggregate back to the docs frame on doc_id; the final aggregate is
    * languages-sized. Both ratios divide exact integer sums, so the
    * doubles are partition-order-independent.
    */
  def tokenizerFertility(docs: DataFrame, merges: Seq[(Int, String, String)]): DataFrame = {
    val enc = bpeEncode(docs, merges).select("doc_id", "n_words", "n_tokens")
    docs.select(col("doc_id"), col("lang"), length(col("text")).cast("long").as("n_chars"))
      .join(enc, "doc_id")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
        (sum(col("n_tokens")).cast("double") / sum(col("n_words"))).as("fertility"),
        (sum(col("n_chars")).cast("double") / sum(col("n_tokens"))).as("chars_per_token"))
  }

  /** Deterministic hash-based stratified sampling: keep a document iff
    * the salted portable hash of its doc_id falls under its stratum's
    * rate. No RNG state — the decision is reproducible across engines,
    * runs, partitionings, and re-ingests (the property that makes a
    * sample auditable and joinable against later pipeline stages), the
    * standard way to downsample a web corpus per source/domain.
    * Rates are rounded to parts-per-million ON THE DRIVER so both
    * engines compare the hash against the same integer literal.
    * Per-row, zero shuffle, zero UDF (PlanSpec pins no exchange). */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Double],
                       strataCol: String = "source", salt: String = "smp",
                       defaultRate: Double = 0.0): DataFrame = {
    val denom = 1000000L
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(math.round(defaultRate * denom))) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(math.round(v * denom))).otherwise(acc)
    }
    docs
      .filter(phash(concat(lit(salt), lit("_"), col("doc_id").cast("string"))) % denom < rate)
      .select(col("doc_id"), col(strataCol))
  }

  /** Deterministic source UPSAMPLING — the other half of the mixing
    * family next to [[stratifiedSample]]'s downsampling: a real-valued
    * per-stratum weight w replicates every document floor(w) times plus
    * one more iff its salted hash falls under frac(w) — how training
    * recipes over-represent high-quality sources (epochs per source,
    * e.g. the Llama/GPT-3 data mixtures with >1 epochs on curated
    * slices) while staying reproducible and auditable (a doc's copy
    * count never depends on partitioning or arrival order). Weights
    * round to parts-per-million on the driver so both engines compare
    * identical integers. Emits (doc_id, stratum, copy) with copy =
    * 1..n_copies.
    *
    * Scale: per-row arithmetic + a bounded sequence fan-out (×w) — no
    * shuffle, no RNG state; the fan-out IS the output. */
  def corpusUpsample(docs: DataFrame, weights: Map[String, Double],
                     strataCol: String = "source", salt: String = "ups",
                     defaultWeight: Double = 0.0): DataFrame = {
    val denom = 1000000L
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 1000),
      s"weights must be in [0, 1000] epochs, got $weights / $defaultWeight")
    val wcol = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(math.round(defaultWeight * denom))) {
        case (acc, (k, v)) => when(col(strataCol) === k, lit(math.round(v * denom))).otherwise(acc)
      }
    docs
      .withColumn("wppm", wcol)
      .withColumn("n_copies",
        expr(s"wppm div $denom") +
          when(phash(concat(lit(salt), lit("_"), col("doc_id").cast("string"))) % denom
            < col("wppm") % denom, 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col(strataCol),
        explode(expr("sequence(1, n_copies)")).as("copy"))
  }

  /** Deterministic train/val/test holdout split by salted content-free
    * hash — the standard way every training pipeline carves out eval
    * data so the assignment is stable under corpus growth and
    * re-sharding (a document's split never depends on which file or
    * partition it arrived in). Emits (doc_id, split). Fractions are
    * parts-per-million so both engines compare the hash against the
    * same integer literals. Per-row, zero shuffle, zero UDF. */
  def corpusSplit(docs: DataFrame, trainPpm: Long = 980000L, valPpm: Long = 10000L,
                  salt: String = "split"): DataFrame = {
    val denom = 1000000L
    // fail fast on impossible fractions: trainPpm + valPpm over the
    // denominator would silently make the test branch unreachable —
    // every "held-out" doc would land in train and nothing would error
    require(trainPpm >= 0 && valPpm >= 0 && trainPpm + valPpm <= denom,
      s"split fractions must satisfy 0 <= trainPpm + valPpm <= $denom ppm, " +
        s"got train=$trainPpm val=$valPpm")
    val h = phash(concat(lit(salt), lit("_"), col("doc_id").cast("string"))) % denom
    docs.select(
      col("doc_id"),
      when(h < trainPpm, lit("train"))
        .when(h < trainPpm + valPpm, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  // ---------------------------------------------------------------------
  // Source/domain-level curation (the URL-filtering family: C4
  // blocklists, RefinedWeb/FineWeb per-domain quality gating)
  // ---------------------------------------------------------------------

  /** Per-source (domain) aggregate curation profile — the signal behind
    * domain-level filtering (Raffel et al. 2020 §2.2 blocklist
    * filtering; Penedo et al. 2023 §3.1 URL scoring): document count,
    * token volume, the fraction of docs passing the per-row
    * [[qualityKeep]] gate, and the exact-duplicate fraction
    * (1 − distinct content hashes / docs). Emits
    * (source, n_docs, n_tokens, keep_rate, dup_rate).
    *
    * Scale shape (100 TB): ONE corpus pass projecting each row to a
    * compact (source, keep-bit, token-count, 32-byte hash) tuple before
    * the per-source aggregate — the only shuffle is keyed on `source`
    * (domains number millions against billions of docs, and the
    * count/sum/avg legs combine map-side; the exact distinct-hash leg
    * is the expensive one, but it shuffles hashes-not-texts, the
    * established dedup discipline). Heavy-hitter domains make the
    * distinct leg's groups large, not skew-fatal: Spark plans
    * count(DISTINCT) as a two-level expand+partial aggregate, and AQE
    * splits oversized partitions. */
  def sourceStats(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        qualityKeep().cast("int").as("keep"),
        wsTokenCount("text").cast("long").as("n_tokens"),
        md5(col("text")).as("content_hash"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        round(avg(col("keep")), 6).as("keep_rate"),
        round((count(lit(1)) - countDistinct(col("content_hash")))
          .cast("double") / count(lit(1)), 6).as("dup_rate"))

  /** Domain-level gate: drop every document whose SOURCE fails the
    * aggregate profile — keep_rate below `minKeepRate` or exact-dup
    * fraction above `maxDupRate` condemns the whole domain, the
    * coarse-grained complement of per-row quality filtering (bad
    * domains are overwhelmingly bad row by row, and gating the domain
    * catches the rows the per-row filter missed). Emits the surviving
    * (doc_id, source).
    *
    * Scale shape: the corpus is scanned twice (once aggregated by
    * [[sourceStats]], once gated) but shuffled only inside the
    * aggregate; the gate itself broadcasts the FAILING source set —
    * bounded by the blocklist's selectivity, not the domain count —
    * into a left_anti, so the second pass is map-only. A threshold
    * lax enough to condemn most of the web inverts that bound; at
    * that point flip to keeping the passing set instead. */
  def sourceFilter(docs: DataFrame, minKeepRate: Double = 0.55,
                   maxDupRate: Double = 0.5): DataFrame = {
    val bad = sourceStats(docs)
      .filter(col("keep_rate") < minKeepRate || col("dup_rate") > maxDupRate)
      .select("source")
    docs.join(broadcast(bad), Seq("source"), "left_anti")
      .select(col("doc_id"), col("source"))
  }

  /** Deterministic epoch shuffle + shard assignment: order the corpus
    * by a salted per-doc hash (a different `salt` per epoch gives a
    * fresh, reproducible permutation) and deal the ranked stream
    * round-robin into `nShards` loader shards — the data-ordering step
    * between a packed corpus and a multi-worker training loader.
    * Round-robin on the global rank makes shard sizes equal to ±1 BY
    * CONSTRUCTION (hash-mod sharding only approximates that), and the
    * assignment is invariant under corpus re-partitioning. Emits
    * (doc_id, shard, pos): shard's `pos`-th sample is `doc_id`.
    *
    * Scale shape (100 TB): the global rank is the classic
    * single-partition-window trap; it runs partition-and-stitch
    * instead ([[graft.ops.Stitch.globalCumsum]] keyed by the top
    * `chunkBits` bits of the hash — the chunk id is order-consistent
    * with the hash itself, so within-chunk ranks + driver-prefix-summed
    * chunk offsets compose to the exact global row_number; uniform
    * hashes make the 2^chunkBits chunks uniform). Driver state is one
    * count per chunk. */
  def corpusShuffle(docs: DataFrame, nShards: Int = 64,
                    salt: String = "epoch1", chunkBits: Int = 8): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(chunkBits >= 1 && chunkBits <= 30,
      s"chunkBits must be in [1, 30], got $chunkBits")
    val h = phash(concat(lit(salt), lit("_"), col("doc_id").cast("string")))
    val ranked = graft.ops.Stitch.globalCumsum(
      docs.select(col("doc_id"), h.as("h")),
      shiftright(col("h"), 60 - chunkBits), Seq(col("h"), col("doc_id")),
      lit(1L), "rank")
    ranked.select(
      col("doc_id"),
      ((col("rank") - 1) % nShards).as("shard"),
      expr(s"(rank - 1) div $nShards").as("pos"))
  }

  // ---------------------------------------------------------------------
  // DSIR: data selection via importance resampling (Xie et al. 2023,
  // "Data Selection for Language Models via Importance Resampling")
  // ---------------------------------------------------------------------

  /** Per-row hashed unigram+bigram feature buckets (`toks` must be bound):
    * DSIR's hashed n-gram representation — every gram hashes into one of
    * `buckets` slots, so the two bag-of-features LMs are BOUNDED at
    * `buckets` rows by construction, independent of corpus size. */
  private def dsirBucketsExpr(buckets: Int): String =
    s"""transform(
       |  concat(toks, ${ngramArrayExpr(2)}),
       |  g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT) % $buckets)""".stripMargin

  /** Per-document DSIR importance weight: log p_target(doc) − log p_raw(doc)
    * under add-one-smoothed hashed-n-gram bag models fit on a target
    * slice vs the raw corpus (Xie et al. 2023 §3: importance weights in
    * an n-gram feature space; hashing bounds the feature dimension).
    * High `logw` = looks like the target domain. Emits
    * (doc_id, n_grams, logw).
    *
    * Scale shape (100 TB):
    *  - both feature LMs are ONE map-side-combined aggregate each whose
    *    output is capped at `buckets` rows — the hashed feature space is
    *    what makes DSIR tractable at corpus scale, and it is exactly
    *    what bounds the shuffle here;
    *  - the log-ratio table (≤ `buckets` rows) BROADCASTS onto the
    *    per-document scoring pass; the corpus is never shuffled on a
    *    gram or bucket key (bucket keys inherit stopword skew — a
    *    sort-merge join here would funnel the corpus through a handful
    *    of reducers);
    *  - the scoring explode sits above a `repartition(doc_id)` of
    *    compact rows (the [[unigramScore]] idiom) so the ×2-token
    *    fan-out never crosses the network;
    *  - totals come from plain scans (`sum(2·|toks|−1)`), not from
    *    re-executing the explode;
    *  - `ln` is 1-ulp across libms → `logw` is quantized at 1e-6 for
    *    cross-engine comparison.
    */
  /** The DSIR log-ratio table: (bucket, ratio) for every feature bucket
    * EITHER corpus occupies — at most `buckets` rows by construction,
    * so it always broadcasts. The join is full-outer: a bucket only the
    * raw corpus hits takes the smoothing mass on the target side, and a
    * bucket only the TARGET hits (possible when the target is an
    * external reference corpus, the documented two-frame use) keeps its
    * high target ratio — a left join on the raw spine would silently
    * hand exactly the most target-indicative unseen grams the neutral
    * default instead ([[graft.streaming.StreamOps.streamingDsirGate]]'s
    * scoring path; batch [[dsirWeights]] only ever scores raw docs, so
    * it never reads the cr=0 rows). */
  def dsirRatioTable(raw: DataFrame, target: DataFrame, buckets: Int = 4096): DataFrame = {
    val bucketsOf = dsirBucketsExpr(buckets)
    def bucketRows(docs: DataFrame) = docs
      .select(split(col("text"), " ").as("toks"))
      .select(explode(expr(bucketsOf)).as("bucket"))
    val cr = bucketRows(raw).groupBy("bucket").agg(count(lit(1)).as("cr"))
    val ct = bucketRows(target).groupBy("bucket").agg(count(lit(1)).as("ct"))
    def total(docs: DataFrame, name: String) = docs
      .agg(sum(lit(2) * size(split(col("text"), " ")) - 1).cast("double").as(name))
    cr.join(ct, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(total(target, "tt")))
      .crossJoin(broadcast(total(raw, "tr")))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)).cast("double") + 1.0) / (col("tt") + buckets)) -
          log((coalesce(col("cr"), lit(0L)).cast("double") + 1.0) / (col("tr") + buckets))).as("ratio"),
        // the smoothed score of a bucket neither corpus occupies — what
        // an unseen gram in a NEW document (ingest gate) falls back to
        (log(lit(1.0) / (col("tt") + buckets)) - log(lit(1.0) / (col("tr") + buckets)))
          .as("default_ratio"))
  }

  /** [[dsirRatioTable]] for the common case where the target domain is
    * a PREDICATE over the raw corpus itself (a language, a source, a
    * quality label) rather than a separate corpus: both count tables
    * and both totals come from ONE corpus pass each via conditional
    * aggregation — halving the number of full scans the two-frame form
    * needs. Use the two-frame overload when the target is external
    * (e.g. a curated reference corpus not contained in `raw`). */
  def dsirRatioTableOf(raw: DataFrame, targetPred: Column,
                       buckets: Int = 4096): DataFrame = {
    val counts = raw
      .select(targetPred.as("is_t"), split(col("text"), " ").as("toks"))
      .select(col("is_t"), explode(expr(dsirBucketsExpr(buckets))).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cr"), count(when(col("is_t"), lit(1))).as("ct"))
    val totals = raw.agg(
      sum(lit(2) * size(split(col("text"), " ")) - 1).cast("double").as("tr"),
      sum(when(targetPred, lit(2) * size(split(col("text"), " ")) - 1))
        .cast("double").as("tt"))
    counts
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("ct").cast("double") + 1.0) / (col("tt") + buckets)) -
          log((col("cr").cast("double") + 1.0) / (col("tr") + buckets))).as("ratio"),
        (log(lit(1.0) / (col("tt") + buckets)) - log(lit(1.0) / (col("tr") + buckets)))
          .as("default_ratio"))
  }

  /** The ratio table folded into ONE row: (ratio_map MAP<BIGINT,DOUBLE>,
    * default_ratio) — the broadcastable form a stateless streaming gate
    * scores per-row against ([[graft.streaming.StreamOps]]). Bounded at
    * `buckets` map entries. */
  def dsirRatioRow(raw: DataFrame, target: DataFrame, buckets: Int = 4096): DataFrame =
    dsirRatioTable(raw, target, buckets)
      .agg(
        map_from_arrays(collect_list(col("bucket")), collect_list(col("ratio")))
          .as("ratio_map"),
        first(col("default_ratio")).as("default_ratio"))

  /** Per-row DSIR score under a one-row broadcast ratio map (`toks`,
    * `ratio_map`, `default_ratio` must be bound): the fold visits each
    * gram bucket in document order. */
  def dsirScoreExpr(buckets: Int): Column =
    round(expr(
      s"""aggregate(${dsirBucketsExpr(buckets)}, CAST(0.0 AS DOUBLE),
         |  (acc, b) -> acc + coalesce(element_at(ratio_map, b), default_ratio))""".stripMargin), 6)

  def dsirWeights(raw: DataFrame, target: DataFrame, buckets: Int = 4096): DataFrame =
    dsirScore(raw, dsirRatioTable(raw, target, buckets), buckets)

  /** [[dsirWeights]] with the target domain as a predicate over the raw
    * corpus — the fused [[dsirRatioTableOf]] counting pass. Identical
    * output to `dsirWeights(raw, raw.filter(targetPred))` (spec-pinned)
    * with half the corpus scans. */
  def dsirWeightsOf(raw: DataFrame, targetPred: Column, buckets: Int = 4096): DataFrame =
    dsirScore(raw, dsirRatioTableOf(raw, targetPred, buckets), buckets)

  private def dsirScore(raw: DataFrame, ratioTable: DataFrame, buckets: Int): DataFrame =
    raw
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(dsirBucketsExpr(buckets))).as("bucket"))
      .join(broadcast(ratioTable.drop("default_ratio")), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), round(sum(col("ratio")), 6).as("logw"))

  /** DSIR selection: the k documents most like the target domain, by
    * importance weight (deterministic top-k stand-in for the paper's
    * Gumbel resampling — ties break on doc_id so both engines agree).
    * `orderBy.limit` plans as a distributed TakeOrdered: per-partition
    * top-k partials, never a global sort. */
  def dsirTopk(raw: DataFrame, target: DataFrame, k: Int = 200,
               buckets: Int = 4096): DataFrame =
    dsirWeights(raw, target, buckets)
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(k)

  /** [[dsirTopk]] over the fused predicate-target form. */
  def dsirTopkOf(raw: DataFrame, targetPred: Column, k: Int = 200,
                 buckets: Int = 4096): DataFrame =
    dsirWeightsOf(raw, targetPred, buckets)
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(k)

  // ---------------------------------------------------------------------
  // Learned quality classifier: logistic regression over the DSIR
  // hashed n-gram feature space — the fastText-style curated-vs-crawl
  // filter (Joulin et al. 2017 "Bag of Tricks"; the GPT-3 data-quality
  // LR of Brown et al. 2020 Appendix A), with the DSIR substrate
  // supplying the bounded feature representation (Xie et al. 2023).
  // ---------------------------------------------------------------------

  /** Train the classifier: full-batch gradient descent on a BOUNDED
    * deterministic sample (at most `sampleN` docs, selected by salted
    * doc_id hash so the sample is unbiased and identical run to run —
    * the [[graft.sim.Ivf]] bounded-training discipline: model fitting
    * collects a capped sample, never the corpus). Features are the
    * hashed unigram+bigram bucket counts of [[dsirBucketsExpr]],
    * normalized per document (x_b = cnt_b / n_grams) so document length
    * doesn't dominate; `targetPred` supplies the label (true = the
    * curated/target class). Returns (bias, weights[buckets]).
    *
    * The driver-side loop is deterministic: the sample arrives in
    * TakeOrdered order, full-batch gradients accumulate in that fixed
    * order, and no randomness enters (weights start at zero). Scale
    * shape (100 TB): ONE distributed pass computes the per-doc feature
    * arrays; `sampleN` bounds the collect and the training cost by
    * construction — exactly how production quality filters are fit
    * (a few hundred thousand labeled docs, scored over the full crawl). */
  def qualityClassifierTrain(docs: DataFrame, targetPred: Column,
                             buckets: Int = 1024, sampleN: Int = 100000,
                             iters: Int = 300, lr: Double = 5.0,
                             l2: Double = 1e-4): (Double, Array[Double]) = {
    val sample = docs
      .select(targetPred.cast("int").as("y"),
        split(col("text"), " ").as("toks"),
        phash(concat(lit("qc_sample_"), col("doc_id"))).as("ord"))
      .select(col("y"), expr(dsirBucketsExpr(buckets)).as("bks"), col("ord"))
      .orderBy("ord")
      .limit(sampleN)
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).map(_.toInt).toArray))
    require(sample.nonEmpty, "classifier training needs a non-empty corpus")
    val m = sample.length
    val w = new Array[Double](buckets)
    var bias = 0.0
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](buckets)
      var gb = 0.0
      var i = 0
      while (i < m) {
        val (y, bks) = sample(i)
        val n = bks.length
        var dot = 0.0
        var j = 0
        while (j < n) { dot += w(bks(j)); j += 1 }
        val p = 1.0 / (1.0 + math.exp(-(bias + dot / n)))
        val err = p - y
        gb += err
        j = 0
        while (j < n) { gw(bks(j)) += err / n; j += 1 }
        i += 1
      }
      var b = 0
      while (b < buckets) { w(b) -= lr * (gw(b) / m + l2 * w(b)); b += 1 }
      bias -= lr * gb / m
      it += 1
    }
    (bias, w)
  }

  /** Score every document under trained weights: logit = bias + mean
    * per-gram weight, prob = sigmoid(logit). Emits
    * (doc_id, n_grams, logit, prob), both scores quantized at 1e-6
    * (`exp` is 1-ulp across libms — the [[unigramScore]] rule).
    *
    * Scale shape (100 TB): the weight vector rides along as ONE
    * broadcast row (8·buckets bytes by construction); the gram fan-out
    * explodes above `repartition(doc_id)` and the aggregate reuses that
    * clustering ([[dsirScore]] idiom) — per-row work against a
    * broadcast artifact, no token-keyed shuffle anywhere. */
  def qualityClassifierScore(docs: DataFrame, bias: Double,
                             weights: Array[Double]): DataFrame = {
    val buckets = weights.length
    val spark = docs.sparkSession
    import spark.implicits._
    val wRow = broadcast(Seq(weights.toSeq).toDF("w"))
    val logitRaw = lit(bias) +
      sum(element_at(col("w"), (col("bucket") + 1).cast("int"))) / count(lit(1))
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(dsirBucketsExpr(buckets))).as("bucket"))
      .crossJoin(wRow)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        round(logitRaw, 6).as("logit"),
        round(lit(1.0) / (lit(1.0) + exp(-logitRaw)), 6).as("prob"))
  }

  /** Per-row classifier probability under a one-row broadcast weight
    * vector (`toks` and `qc_w` must be bound; `qc_w` is the
    * ARRAY<DOUBLE> weight column) — the fold-order twin of
    * [[qualityClassifierScore]] for stateless streaming gates. Parity
    * with the batch aggregate holds up to the 1e-6 quantization
    * boundary (the [[unigramScoreExpr]] fold-vs-partition-order
    * caveat). */
  def qualityClassifierProbExpr(bias: Double, buckets: Int): Column = {
    val logit = lit(bias) + expr(
      s"""aggregate(${dsirBucketsExpr(buckets)}, CAST(0.0 AS DOUBLE),
         |  (acc, b) -> acc + element_at(qc_w, CAST(b + 1 AS INT)))""".stripMargin) /
      (lit(2) * size(col("toks")) - 1)
    round(lit(1.0) / (lit(1.0) + exp(-logit)), 6)
  }

  /** Classifier evaluation report — the ML-ops observable every
    * learned filter ships with: confusion counts and
    * precision/recall/F1 (exact integer ppm) of the trained
    * [[qualityClassifierScore]] at prob ≥ 0.5 against the proxy label,
    * over an evaluation slice. One scoring pass (the classifier's own
    * broadcast-weight shape) + one doc_id equi-join to the labels +
    * a one-row confusion aggregate; the ppm metrics divide exact
    * longs (`div`, zero-denominator → 0), so the row is oracle-exact. */
  def classifierEval(docs: DataFrame, bias: Double, weights: Array[Double],
                     targetPred: Column): DataFrame = {
    val scored = qualityClassifierScore(docs, bias, weights)
      .select(col("doc_id"), col("prob"))
    val labeled = docs.select(col("doc_id"), targetPred.as("label"))
    scored.join(labeled, "doc_id")
      .select((col("prob") >= 0.5).as("pred"), col("label"))
      .agg(
        sum(when(col("pred") && col("label"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("label"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("label"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("label"), 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("CASE WHEN tp + fp = 0 THEN 0L ELSE (tp * 1000000) div (tp + fp) END")
          .as("precision_ppm"),
        expr("CASE WHEN tp + fn = 0 THEN 0L ELSE (tp * 1000000) div (tp + fn) END")
          .as("recall_ppm"),
        expr("CASE WHEN 2 * tp + fp + fn = 0 THEN 0L " +
          "ELSE (2 * tp * 1000000) div (2 * tp + fp + fn) END").as("f1_ppm"))
  }

  /** Session-trained classifier weights, keyed by (sfDir, buckets) so
    * the literal-weights oracle can only be emitted for the exact
    * configuration the query trained — the [[graft.sim.Ivf]]
    * cached-centroids discipline, fail-loud on ambiguity. */
  private val trainedQc = scala.collection.concurrent.TrieMap
    .empty[(String, Int), (Double, Array[Double])]

  private[text] def cachedQc: Option[(Double, Array[Double])] =
    trainedQc.headOption.map { case (k, v) =>
      require(trainedQc.size == 1,
        s"classifier oracle ambiguity: trained for ${trainedQc.keys.mkString(", ")}")
      v
    }

  /** The proxy target label for the registered query: a fixed slice of
    * curated `source` values — the synthetic stand-in for "Wikipedia
    * side" in a curated-vs-crawl filter. */
  private val qcTargetPred: Column =
    col("source").isin("src0", "src1", "src2", "src3", "src4")

  private val QC_BUCKETS = 1024

  /** The registered query: train on the proxy source label (cached for
    * the oracle), score the full corpus. */
  private def qualityClassifierQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (b, w) = trainedQc.getOrElseUpdate((dir, QC_BUCKETS),
      qualityClassifierTrain(docs, qcTargetPred, buckets = QC_BUCKETS))
    qualityClassifierScore(docs, b, w)
  }

  /** quality_classifier oracle, rendered from the weights the query
    * just learned (absent until it runs — the Ivf.cachedCentroids
    * pattern): the weight vector becomes a DuckDB list literal indexed
    * by bucket, the bucket derivation is the shared portable-hash
    * fragment, and both scores quantize at 1e-6. */
  private def qcOracles: Map[String, String] = cachedQc match {
    case None => Map.empty
    case Some((bias, w)) =>
      val wl = w.mkString("[", ", ", "]")
      def scoreCtes(docFilter: String) =
        s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents$docFilter),
           |g AS (SELECT doc_id, unnest(list_concat(toks,
           |        list_transform(range(1, len(toks)), i -> concat(toks[i], ' ', toks[i + 1])))) AS gram
           |      FROM t),
           |bk AS (SELECT doc_id, ${phashSql("gram")} % $QC_BUCKETS AS bucket FROM g),
           |wt AS (SELECT $wl AS wl),
           |s AS (SELECT doc_id, count(*) AS n_grams, sum(wl[CAST(bucket + 1 AS INT)]) AS sw
           |      FROM bk CROSS JOIN wt GROUP BY doc_id)""".stripMargin
      Map("quality_classifier" ->
        s"""WITH ${scoreCtes("")}
           |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           |  round($bias + sw / n_grams, 6) AS logit,
           |  round(1.0 / (1.0 + exp(-($bias + sw / n_grams))), 6) AS prob
           |FROM s""".stripMargin,
        "classifier_eval" ->
        s"""WITH ${scoreCtes(" WHERE doc_id % 5 = 0")},
           |p AS (SELECT round(1.0 / (1.0 + exp(-($bias + sw / n_grams))), 6) >= 0.5 AS pred,
           |        d.source IN ('src0', 'src1', 'src2', 'src3', 'src4') AS label
           |      FROM s JOIN documents d ON s.doc_id = d.doc_id),
           |c AS (SELECT
           |  CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |  CAST(sum(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |  CAST(sum(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |  CAST(sum(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS tn
           |  FROM p)
           |SELECT tp, fp, fn, tn,
           |  CAST(CASE WHEN tp + fp = 0 THEN 0 ELSE (tp * 1000000) // (tp + fp) END AS BIGINT) AS precision_ppm,
           |  CAST(CASE WHEN tp + fn = 0 THEN 0 ELSE (tp * 1000000) // (tp + fn) END AS BIGINT) AS recall_ppm,
           |  CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0 ELSE (2 * tp * 1000000) // (2 * tp + fp + fn) END AS BIGINT) AS f1_ppm
           |FROM c""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    // ---- Gopher/C4-style quality filter + n-gram repetition ----
    "txt_quality" -> { (s, dir) => qualityStats(Tables.documents(s, dir)) },
    "txt_top_ngram" -> { (s, dir) => topNgram(Tables.documents(s, dir)) },
    "txt_unigram_lm" -> { (s, dir) => unigramScore(Tables.documents(s, dir)) },
    "txt_bigram_lm" -> { (s, dir) => bigramScore(Tables.documents(s, dir)) },
    "txt_kn_lm" -> { (s, dir) => kneserNeyScore(Tables.documents(s, dir)) },
    "txt_kn_lm_3" -> { (s, dir) => kneserNeyScore3(Tables.documents(s, dir)) },
    "txt_kn_lm_5" -> { (s, dir) => kneserNeyScoreN(Tables.documents(s, dir), 5) },
    "txt_entropy" -> { (s, dir) => tokenEntropy(Tables.documents(s, dir)) },
    "txt_dup_coverage" -> { (s, dir) => dupNgramCoverage(Tables.documents(s, dir)) },
    "txt_ppl_buckets" -> { (s, dir) => perplexityBuckets(Tables.documents(s, dir)) },
    "bpe_encode" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val merges = bpeTrain(docs, numMerges = 20)
      cachedMerges = Some(merges)
      bpeEncode(docs, merges)
    },
    "tok_fertility" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val merges = bpeTrain(docs, numMerges = 20)
      cachedFertilityMerges = Some(merges)
      tokenizerFertility(docs, merges)
    },

    // ---- unigram-LM tokenizer (Kudo 2018; SentencePiece unigram) ----
    // EM training is iterative and not SQL-expressible → rows-only
    // driver check; the algorithm is pinned in UnigramLmSpec (EM
    // behavior, driver/distributed parity, partitioning invariance).
    "unigram_train" -> { (s, dir) =>
      import s.implicits._
      UnigramLm.train(Tables.documents(s, dir),
        vocabSize = 48, maxPieceLen = 5, seedSize = 128).toDF("piece", "logp")
    },
    "unigram_encode" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pieces = UnigramLm.train(docs, vocabSize = 48, maxPieceLen = 5, seedSize = 128)
      UnigramLm.cachedPieces = Some(pieces)
      UnigramLm.encode(docs, pieces, maxPieceLen = 5)
    },

    // ---- WordPiece tokenizer (Schuster & Nakajima 2012; BERT) ----
    // likelihood-scored merge loop: iterative, not SQL-expressible →
    // rows-only driver check; pinned against a reference trainer and the
    // distributed path in WordPieceSpec
    "wordpiece_train" -> { (s, dir) =>
      import s.implicits._
      WordPiece.train(Tables.documents(s, dir), numMerges = 30).toDF("rank", "token")
    },
    "wordpiece_encode" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val vocab = WordPiece.train(docs, numMerges = 30)
      WordPiece.cachedVocab = Some(vocab)
      WordPiece.encode(docs, vocab)
    },
    "txt_scrub_ngrams" -> { (s, dir) => scrubFrequentNgrams(Tables.documents(s, dir)) },
    "dedup_substring" -> { (s, dir) => exactSubstringDedup(Tables.documents(s, dir)) },
    "dedup_substring_keep" -> { (s, dir) => exactSubstringDedupKeep(Tables.documents(s, dir)) },
    // incremental form: odd docs (the "new batch") scrubbed of windows
    // already present in the even-doc corpus (the dedup_incremental
    // split — the planted %100==1 dups cross it)
    "dedup_substring_incr" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      exactSubstringDedupAgainst(docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0))
    },
    "txt_signals" -> { (s, dir) => signalSweep(Tables.documents(s, dir)) },
    // DEFLATE is not SQL-expressible → rows-only; CompressSpec pins it
    "txt_compress" -> { (s, dir) => compressionRatio(Tables.documents(s, dir)) },
    "txt_winnow" -> { (s, dir) => winnowFingerprints(Tables.documents(s, dir)) },
    "dedup_winnow_pairs" -> { (s, dir) => winnowPairs(Tables.documents(s, dir)) },
    // rows-only (no SQL oracle: gear-table rolling hash not expressible
    // in DuckDB — the deflate precedent); CdcSpec pins semantics
    "txt_cdc" -> { (s, dir) => cdcFingerprints(Tables.documents(s, dir)) },
    "dedup_cdc_pairs" -> { (s, dir) => cdcPairs(Tables.documents(s, dir)) },
    "txt_normalize" -> { (s, dir) => normalizeText(Tables.documents(s, dir)) },
    // 'a a' exercises OVERLAPPING occurrence counting ('a a a' hits
    // twice); 'dup' is the rare planted marker
    "txt_blocklist" -> { (s, dir) =>
      blocklistFilter(Tables.documents(s, dir),
        Seq("dup", "slow query", "big data", "a a"))
    },
    "txt_blocklist_spans" -> { (s, dir) =>
      blocklistSpans(Tables.documents(s, dir),
        Seq("dup", "slow query", "big data", "a a"))
    },
    "txt_blocklist_redact" -> { (s, dir) =>
      blocklistRedact(Tables.documents(s, dir),
        Seq("dup", "slow query", "big data", "a a"))
    },
    // graded twin of txt_decontaminate: same bench/corpus split
    "txt_contain_frac" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      containmentFraction(docs.filter(col("doc_id") >= 10),
        docs.filter(col("doc_id") < 10), n = 5)
    },
    "txt_chunk" -> { (s, dir) => chunkDocs(Tables.documents(s, dir)) },
    // Bloom gate: filter built over the even-doc_id half, every doc
    // probed — evens all hit (no false negatives), odds only on true
    // content duplicates or the deterministic false-positive rate
    "bloom_dedup" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      bloomProbe(docs, bloomBuild(docs.filter(col("doc_id") % 2 === 0)))
    },
    "corpus_sample" -> { (s, dir) =>
      stratifiedSample(Tables.documents(s, dir),
        Map("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25, "src4" -> 0.1),
        defaultRate = 0.05)
    },
    "corpus_upsample" -> { (s, dir) =>
      corpusUpsample(Tables.documents(s, dir),
        Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.4), defaultWeight = 0.0)
    },
    "corpus_split" -> { (s, dir) => corpusSplit(Tables.documents(s, dir)) },
    "corpus_shuffle" -> { (s, dir) => corpusShuffle(Tables.documents(s, dir)) },

    // ---- domain-level curation: aggregate profile + whole-source gate ----
    "source_stats" -> { (s, dir) => sourceStats(Tables.documents(s, dir)) },
    "source_filter" -> { (s, dir) => sourceFilter(Tables.documents(s, dir)) },

    // ---- DSIR importance weighting: target = the English slice.
    // The target is a slice of the corpus itself, so the queries run the
    // fused single-counting-pass form; output is identical to the
    // two-frame form (spec-pinned), and the oracle is shared. ----
    "dsir_weights" -> { (s, dir) =>
      dsirWeightsOf(Tables.documents(s, dir), col("lang") === "en")
    },
    "dsir_topk" -> { (s, dir) =>
      dsirTopkOf(Tables.documents(s, dir), col("lang") === "en")
    },

    // ---- learned quality classifier: LR over hashed n-gram features,
    // trained on the proxy source label, scored distributively ----
    "quality_classifier" -> qualityClassifierQuery _,

    // ---- classifier evaluation: confusion + P/R/F1 on the %5 eval
    // slice, same session-trained weights as quality_classifier ----
    "classifier_eval" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val (b, w) = trainedQc.getOrElseUpdate((dir, QC_BUCKETS),
        qualityClassifierTrain(docs, qcTargetPred, buckets = QC_BUCKETS))
      classifierEval(docs.filter(col("doc_id") % 5 === 0), b, w, qcTargetPred)
    },

    // ---- BPE tokenizer training (Sennrich et al. 2016) ----
    "bpe_pairs" -> { (s, dir) => bpePairs(Tables.documents(s, dir)) },
    // iterative argmax-and-rewrite: not SQL-expressible → rows-only
    // driver check; the algorithm is pinned against a driver-side
    // reference implementation in TextQueriesSpec
    "bpe_train" -> { (s, dir) =>
      val m = bpeTrain(Tables.documents(s, dir), numMerges = 20)
      import s.implicits._
      m.toDF("rank", "left", "right")
    },
    "txt_repetition" -> { (s, dir) => repetitionSignals(Tables.documents(s, dir)) },
    "txt_repetition_keep" -> { (s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"), repetitionKeep().as("keep"))
    },

    // ---- BPE-ish token counting (whitespace twin + subword-ish regex);
    // the oracle runs the SAME pattern under DuckDB's RE2, pinning the
    // cross-engine-portable claim on BpeishPattern for real ----
    "txt_bpeish" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        wsTokenCount("text").as("ws_tokens"),
        bpeishTokenCount("text").as("bpeish_tokens"))
    },

    // ---- incremental dedup: new batch (odd ids) vs corpus (even ids) ----
    "dedup_incremental" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      lshPairsAgainst(docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0))
    },

    // ---- benchmark decontamination: eval set = docs 0-9 ----
    "txt_decontaminate" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      decontaminate(docs.filter(col("doc_id") >= 10),
        docs.filter(col("doc_id") < 10))
    },

    // ---- full cleaning pipeline: decontaminate + quality + dedup ----
    "corpus_clean" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      corpusClean(docs.filter(col("doc_id") >= 10),
        docs.filter(col("doc_id") < 10))
    },
    // the per-stage survivor report over the same fixture split
    "corpus_funnel" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      corpusFunnel(docs.filter(col("doc_id") >= 10),
        docs.filter(col("doc_id") < 10))
    },

    // ---- the end-to-end curate-tokenize-pack pipeline: corpus_clean
    // survivors train + encode a BPE tokenizer, the encoded counts pack
    // into 512-token chunks; the composed oracle hash-verifies the
    // final layout ----
    "corpus_tokenize" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      corpusTokenize(docs.filter(col("doc_id") >= 10),
        docs.filter(col("doc_id") < 10))
    },

    // ---- GPT-style sequence packing: concat in doc_id order, cut
    // into fixed 512-token training chunks, emit per-doc slices ----
    "txt_pack" -> { (s, dir) =>
      packChunks(Tables.documents(s, dir), budget = 512L)
    },

    // ---- deterministic per-language training-mix allocation ----
    "corpus_mix" -> { (s, dir) =>
      corpusMix(Tables.documents(s, dir),
        Map("en" -> 0.5, "de" -> 0.15, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.1),
        budget = 200L, score = col("n_chars"))
    },

    // ---- token counting + quality scoring ----
    "corpus_mix_tokens" -> { (s, dir) => corpusMixTokens(Tables.documents(s, dir)) },
    "corpus_mix_temp" -> { (s, dir) =>
      corpusMixTemp(Tables.documents(s, dir))
    },

    "txt_stats" -> { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          length(col("text")).as("len_chars"),
          // exact arithmetic: avg token length from total chars minus separators
          ((length(col("text")) - (size(col("toks")) - 1)).cast("double") / size(col("toks"))).as("avg_tok_len"),
          size(filter(col("toks"), t => t.isin(STOP: _*))).as("n_stop"),
          (size(filter(col("toks"), t => t.isin(STOP: _*))).cast("double") / size(col("toks"))).as("stop_ratio"))
    },

    // ---- language-ID heuristic (marker-word + script detection) ----
    "txt_langid" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      def hits(ws: Seq[String]) = size(filter(toks, t => t.isin(ws: _*)))
      val en = hits(Seq("the", "a", "of", "and", "is"))
      val de = hits(Seq("der", "die", "das", "und", "ist"))
      val fr = hits(Seq("le", "la", "les", "et", "est"))
      val es = hits(Seq("el", "los", "las", "y", "es"))
      // CJK char count WITHOUT materializing a throwaway match array:
      // chars removed by deleting the range == chars in the range
      val zh = length(col("text")) -
        length(regexp_replace(col("text"), "[\\u4e00-\\u9fff]", ""))
      Tables.documents(s, dir).select(
        col("doc_id"),
        when(zh > 0, "zh")
          .when(en >= de && en >= fr && en >= es && en > 0, "en")
          .when(de >= fr && de >= es && de > 0, "de")
          .when(fr >= es && fr > 0, "fr")
          .when(es > 0, "es")
          .otherwise("und").as("pred_lang"),
        col("lang").as("label_lang"))
    },

    // ---- document fingerprint: normalize + hash ----
    "txt_fingerprint" -> { (s, dir) =>
      val norm = regexp_replace(lower(col("text")), "[^a-z0-9\\u4e00-\\u9fff]+", " ")
      Tables.documents(s, dir).select(
        col("doc_id"), md5(trim(norm)).as("fingerprint"))
    },

    // ---- exact dedup: hash-groupBy, keep min doc_id ----
    "dedup_exact" -> { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
    },

    // ---- MinHash signatures (k=16 permutations over word-3-gram shingles) ----
    "dedup_minhash_sig" -> { (s, dir) => minhashSig(Tables.documents(s, dir)) },

    // ---- LSH: band signatures → candidate pairs → exact Jaccard verify ----
    "dedup_lsh_pairs" -> { (s, dir) => lshPairs(Tables.documents(s, dir)) },

    // ---- pair graph → dedup CLUSTERS: connected components over the
    // LSH pairs (large-star/small-star, ops.Components), labeling each
    // doc with the min doc_id of its near-dup cluster — the canonical
    // "which copy survives" resolution step ----
    "dedup_components" -> { (s, dir) =>
      val pairs = lshPairs(Tables.documents(s, dir)).select(col("d1"), col("d2"))
      graft.ops.Components.connectedComponents(pairs, "d1", "d2")
        .select(col("node").as("doc_id"), col("component"))
    },

    // ---- dedup observability: the cluster-size histogram (how much
    // duplication, in what shape — pairs vs cliques) from the same
    // component labels; cluster sizes aggregate to k tiny rows ----
    "dedup_stats" -> { (s, dir) =>
      val pairs = lshPairs(Tables.documents(s, dir)).select(col("d1"), col("d2"))
      graft.ops.Components.connectedComponents(pairs, "d1", "d2")
        .groupBy("component").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
    },

    // ---- clusters → the deduplicated CORPUS itself ([[dedupKeep]]):
    // survivor = cluster-min doc_id (default policy), everything else
    // dropped, docs never emitted as a pair (singletons) kept ----
    "dedup_keep" -> { (s, dir) => dedupKeep(Tables.documents(s, dir)) },

    // ---- the non-default survivor policy, cross-engine: keep the
    // LONGEST doc of each near-dup cluster (ties to the smaller
    // doc_id) — the "keep the best copy" policy real pipelines run ----
    "dedup_keep_best" -> { (s, dir) =>
      dedupKeep(Tables.documents(s, dir),
        keepBy = Some(length(col("text"))), ascending = false)
    },

    // ---- brute-force n-gram Jaccard baseline (bounded subset; the 200-
    // doc window and 0.02 threshold keep the result at O(10-100) rows so
    // the oracle actually verifies the join+ratio arithmetic) ----
    "dedup_jaccard_brute" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
      val sh = shingles(docs)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("s1").join(sh.as("s2"),
          col("s1.shingle") === col("s2.shingle") && col("s1.doc_id") < col("s2.doc_id"))
        .groupBy(col("s1.doc_id").as("d1"), col("s2.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.as("n1"), col("d1") === col("n1.doc_id"))
        .join(sizes.as("n2"), col("d2") === col("n2.doc_id"))
        .select(col("d1"), col("d2"),
          (col("inter").cast("double") / (col("n1.n") + col("n2.n") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.02)
    },

    // ---- corpus vocabulary: global token frequencies, top-50 ----
    "txt_vocab_topk" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("tok"))
        .limit(50)
    },

    // ---- TF-IDF scores for (doc, token) pairs over the corpus ----
    "txt_tfidf" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val n = docs.count() // corpus size: parquet metadata count, no scan
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      // document frequency as a window over tf — one tokenize pass, one
      // shuffle, no self-join re-deriving the same lineage
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))
      tf.withColumn("df", count(lit(1)).over(w))
        // ln is 1-ulp across libms → quantize at 1e-6
        .select(col("doc_id"), col("tok"),
          round(col("tf") * log(lit(n.toDouble) / col("df")), 6).as("tfidf"))
        .filter(col("doc_id") < 50)
    },

    // ---- per-column numeric profile (training-data QC) ----
    "data_profile" -> { (s, dir) =>
      // count/min/max/sum in ONE scan; exact medians via the bounded-
      // memory bracket-and-select (Scale.exactQuantile) instead of the
      // percentile aggregate, whose per-partition counts-map of every
      // distinct value is an unbounded buffer at corpus scale
      val li = graft.Tables.lineitem(s, dir)
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount")
      val meds = graft.ops.Scale.exactQuantiles(li, cs, 0.5) // shared passes
      val aggs = cs.flatMap { c => Seq(
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"),
        sum(round(col(c) * lit(10000)).cast("long")).as(s"sum_$c"),
        round(lit(meds(c)), 6).as(s"med_$c"))
      } :+ count(lit(1)).as("n")
      val wide = li.agg(aggs.head, aggs.tail: _*)
      val stackExpr = s"stack(${cs.length}, " + cs.map { c =>
        s"'$c', min_$c, max_$c, sum_$c, med_$c"
      }.mkString(", ") + ") AS (column, min_v, max_v, sum_e4, median)"
      wide.select(col("n"), expr(stackExpr))
        .select(col("column"), col("n"), col("min_v"), col("max_v"),
          col("sum_e4"), col("median"))
    },

    // ---- SimHash (32-bit, distinct-token features) ----
    "dedup_simhash" -> { (s, dir) => simhashFrame(Tables.documents(s, dir)) },

    // ---- SimHash near-dup pairs at hamming <= 3 (Manku et al. 2007):
    // 4 bands of 8 bits — by pigeonhole any pair within hamming 3
    // shares at least one band, so candidates meet in band equi-join
    // buckets (skew-salted), never all-pairs; exact hamming verifies ----
    "dedup_simhash_pairs" -> { (s, dir) =>
      simhashPairs(Tables.documents(s, dir))
    },

    // ---- BM25 ranked retrieval (Robertson/Sparck Jones; k1=1.2,
    // b=0.75) for a literal term query: ONE one-row stats aggregate
    // (N, total length, per-term df) broadcasts onto a map-only scoring
    // pass, top-k = distributed TakeOrdered ----
    "txt_bm25" -> { (s, dir) =>
      bm25(Tables.documents(s, dir), Seq("spark", "join", "data"))
    },

    // ---- incremental simhash dedup: odd docs arrive as the batch, even
    // docs are the existing corpus (its persistable banded index) —
    // best corpus near-duplicate per batch doc at hamming <= 3 ----
    "dedup_simhash_incr" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      simhashDedupAgainst(docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0))
    },

    // ---- incremental winnow dedup: same batch/corpus split, best
    // corpus match by shared selected fingerprints ----
    "dedup_winnow_incr" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      winnowDedupAgainst(docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0))
    },

    // ---- exact heavy hitters through a Misra-Gries sketch: candidates
    // from a k-bounded mergeable summary (one pass, k entries per
    // partition over the wire), exact counts from a candidate-filtered
    // second pass — never a full-vocabulary shuffle ----
    "txt_heavy_hitters" -> { (s, dir) =>
      heavyHitters(Tables.documents(s, dir), denom = 256)
    },

    // ---- robust IQR outlier trim: data-driven fences over the
    // corpus's own signal distribution ----
    "quality_outliers" -> { (s, dir) =>
      qualityOutliers(Tables.documents(s, dir))
    },

    // ---- corpus Zipf profile: token-distribution sanity report ----
    "txt_zipf" -> { (s, dir) => zipfProfile(Tables.documents(s, dir)) },

    // ---- Heaps-law vocabulary growth: the companion sanity report ----
    "txt_heaps" -> { (s, dir) => heapsProfile(Tables.documents(s, dir)) },

    // ---- PMI collocations (Church & Hanks 1990) ----
    "txt_pmi" -> { (s, dir) => pmiCollocations(Tables.documents(s, dir)) },

    // ---- Flesch/FK readability signals ----
    "txt_readability" -> { (s, dir) => readability(Tables.documents(s, dir)) },

    // ---- percentile report over the quantile grid ----
    "corpus_percentiles" -> { (s, dir) =>
      corpusPercentiles(Tables.documents(s, dir))
    },

    // ---- character-class profile (script/charset signal) ----
    "txt_charclass" -> { (s, dir) => charClassProfile(Tables.documents(s, dir)) },

    // ---- corpus snapshot diff over the shared fixture split ----
    "corpus_diff" -> { (s, dir) =>
      val (old, neu) = snapshotSplit(Tables.documents(s, dir))
      corpusDiff(old, neu)
    },

    // ---- token-distribution drift over the same snapshot split ----
    "vocab_drift" -> { (s, dir) =>
      val (old, neu) = snapshotSplit(Tables.documents(s, dir))
      vocabDrift(old, neu)
    },

    // ---- edit-distance-verified near-dup pairs: winnow candidates,
    // exact Levenshtein verdict ----
    "dedup_editdist_pairs" -> { (s, dir) =>
      editDistPairs(Tables.documents(s, dir))
    },

    // ---- incremental edit-distance dedup: winnow-index candidates,
    // Levenshtein verification of the best match only ----
    "dedup_editdist_incr" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      editDistAgainst(docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0))
    }
  )

  /** Exact heavy hitters — every token with frequency > n/`denom` over
    * the corpus token stream, with exact counts — WITHOUT a
    * full-vocabulary groupBy: pass 1 runs the [[MisraGriesAgg]] sketch
    * (k-bounded state, the Misra-Gries guarantee covers every token
    * above n/(k+1) ⊇ the n/denom targets since k+1 >= denom) plus the
    * stream length in one aggregate; the bounded candidate array
    * collects to the driver (the cached-literal discipline) and pass 2
    * counts ONLY candidate tokens (an InSet filter at the scan, so the
    * verify shuffle is k keys, not the vocabulary). Sketch counts are
    * merge-order-dependent; the published counts are the exact pass-2
    * values — deterministic under any partitioning, spec-pinned. */
  def heavyHitters(docs: DataFrame, denom: Int, k: Int = 511): DataFrame = {
    require(denom >= 2 && k + 1 >= denom,
      s"Misra-Gries guarantee needs k+1 >= denom, got k=$k denom=$denom")
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val summary = toks
      .agg(MisraGriesAgg.mgCandidates(col("tok"), k).as("cands"),
        count(lit(1)).as("n")).head()
    val cands = summary.getSeq[String](0)
    val n = summary.getLong(1)
    if (cands.isEmpty) return toks.select(col("tok"), lit(0L).as("freq")).limit(0)
    toks.filter(col("tok").isin(cands: _*))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      // integer comparison, never a divided threshold: freq·denom > n
      .filter(col("freq") * lit(denom.toLong) > lit(n))
  }

  /** 32-bit SimHash fingerprints — one pass, 32 parallel bit-weight
    * aggregates (no ×32 row explode). */
  def simhashFrame(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", phash(col("tok")) % lit(4294967296L))
    val ws = (0 until 32).map { b =>
      sum(when(expr(s"(h >> $b) & 1") === 1L, 1).otherwise(-1)).as(s"w$b")
    }
    val fold = (0 until 32).map(b => when(col(s"w$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    tok.groupBy("doc_id").agg(ws.head, ws.tail: _*)
      .select(col("doc_id"), fold.as("simhash"))
  }

  /** 60-bit SimHash fingerprints (the full 60-bit phash as the
    * per-token feature hash) — the WIDE twin of [[simhashFrame]]: a
    * 32-bit fingerprint's 8-bit bands cap the pair search at 4·2^8 =
    * 1024 buckets (occupancy n/256 → a quadratic wall by ~100k docs);
    * 60 bits give 4 bands of 15 with 131k buckets. Same one-pass
    * 60-parallel-bit-weight aggregate, no ×60 explode. */
  def simhashFrameWide(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", phash(col("tok")))
    val ws = (0 until 60).map { b =>
      sum(when(expr(s"(h >> $b) & 1") === 1L, 1).otherwise(-1)).as(s"w$b")
    }
    val fold = (0 until 60).map(b => when(col(s"w$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    tok.groupBy("doc_id").agg(ws.head, ws.tail: _*)
      .select(col("doc_id"), fold.as("simhash"))
  }

  /** SimHash near-duplicate pairs at hamming distance <= `maxHamming`
    * (Manku et al. 2007, "Detecting near-duplicates for web crawling"):
    * the 60-bit fingerprint splits into 4 bands of 15 bits — a pair
    * within hamming 3 shares >= 1 band verbatim (pigeonhole), so
    * banding is LOSSLESS at hamming <= 3 (spec-pinned against the
    * quadratic reference) while candidates meet in compact band-key
    * equi-join buckets ([[graft.ops.Scale.selfPairs]], hot bands
    * triangle-salted).
    *
    * Scale shape: fingerprints collapse to DISTINCT hashes before the
    * quadratic stage — exact-duplicate texts (the dominant duplication
    * mode) cost one row each there, and a 1000-doc identical-text
    * clique re-expands only in the final hash→doc joins, which shuffle
    * compact (hash, doc_id) longs. Within-group (hamming-0) pairs come
    * from the same salted selfPairs machinery keyed on the hash. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4 bands over 60 bits guarantee recall only to hamming 3, got $maxHamming")
    // multi-consumer guard: selfPairs reads its input from 5 subtrees
    // (skew detection + cold/hot sides) — checkpoint the aggregate once
    val sh = simhashFrameWide(docs).localCheckpoint()
    // checkpointed for the same reason: selfPairs consumes its input
    // from five subtrees, which would re-run the distinct aggregate
    val hs = sh.select(col("simhash").as("h")).distinct().localCheckpoint()
    val banded = hs
      .select(col("h"), explode(expr("sequence(0, 3)")).as("b"))
      .select(expr("b * 32768 + ((h >> (15 * b)) & 32767)").as("bk"), col("h"))
    val hPairs = graft.ops.Scale.selfPairs(banded, Seq("bk"), "h")
      .select(col("h_1"), col("h_2")).distinct()
      .withColumn("hamming", expr("CAST(bit_count(h_1 ^ h_2) AS INT)"))
      .filter(col("hamming") <= maxHamming && col("hamming") > 0)
    val cross = hPairs
      .join(sh.select(col("simhash").as("h_1"), col("doc_id").as("da")), Seq("h_1"))
      .join(sh.select(col("simhash").as("h_2"), col("doc_id").as("db")), Seq("h_2"))
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"), col("hamming"))
    val same = graft.ops.Scale.selfPairs(
        sh.select(col("simhash").as("h"), col("doc_id")), Seq("h"), "doc_id")
      .select(col("doc_id_1").as("d1"), col("doc_id_2").as("d2"),
        lit(0).as("hamming"))
    cross.union(same)
  }

  /** Per-row HOF twin of [[simhashFrameWide]] over a bound `hs` column
    * (the distinct-token 60-bit hashes): bit b of the result is set iff
    * Σ ±1 over the hashes' bit b is positive — identical fingerprints
    * to the explode+groupBy aggregate (sum order is irrelevant to a
    * sign; parity spec-pinned). The per-row form is what a streaming
    * micro-batch evaluates (no explode/groupBy before a stateful op);
    * the batch aggregate form stays the corpus-scale path. */
  private[graft] val simhashWideOfHs: String =
    """aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, b) ->
      |  acc + IF(aggregate(hs, 0, (a, h) -> a + IF((h >> b) & 1 = 1, 1, -1)) > 0,
      |    shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))""".stripMargin

  /** The distinct-token 60-bit hash array of `text` (binds the `hs`
    * column [[simhashWideOfHs]] folds over). */
  private[graft] val simhashHashesExpr: String =
    s"transform(array_distinct(split(text, ' ')), t -> ${phashFrag("t")})"

  /** Persistable banded fingerprint index of a corpus — the simhash
    * member of the incremental-dedup index family (next to
    * `bandSignatures`, `bloomBuild`, `substringIndex`, `corpusIndex`):
    * (bk, h, dup_of) rows, 4 per document. Write it bucketed by `bk`
    * (the sorted/bucketed corpus-writer discipline) and the per-batch
    * probe join's static side carries no Exchange. */
  def simhashIndex(corpus: DataFrame): DataFrame =
    simhashFrameWide(corpus)
      .select(col("doc_id").as("dup_of"), col("simhash").as("h"),
        explode(expr("sequence(0, 3)")).as("b"))
      .select(expr("b * 32768 + ((h >> (15 * b)) & 32767)").as("bk"),
        col("h"), col("dup_of"))

  /** ALL batch-vs-corpus matches at hamming <= `maxHamming` —
    * (batch_id, dup_of, hamming). Candidates meet in the banded index
    * buckets (lossless at hamming <= 3, the [[simhashPairs]]
    * pigeonhole); the corpus contributes only its compact (bk, h,
    * dup_of) index, never text. Public so the streaming gate has a
    * batch-parity reference. */
  def simhashMatchesAgainst(batch: DataFrame, corpus: DataFrame,
                            maxHamming: Int = 3,
                            corpusIndex: Option[DataFrame] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4 bands over 60 bits guarantee recall only to hamming 3, got $maxHamming")
    val cIdx = corpusIndex.getOrElse(simhashIndex(corpus))
    val b = simhashFrameWide(batch).localCheckpoint()
      .select(col("doc_id").as("batch_id"), col("simhash").as("bh"),
        explode(expr("sequence(0, 3)")).as("b"))
      .select(expr("b * 32768 + ((bh >> (15 * b)) & 32767)").as("bk"),
        col("batch_id"), col("bh"))
    b.join(cIdx, Seq("bk"))
      .withColumn("hamming", expr("CAST(bit_count(bh ^ h) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("batch_id"), col("dup_of"), col("hamming"))
      .distinct()
  }

  /** Incremental simhash dedup verdicts: each batch document's BEST
    * corpus near-duplicate (min hamming, ties -> min dup_of) — the
    * fuzzy-fingerprint member of the incremental family, mirroring
    * [[lshPairsAgainst]]'s (batch_id, dup_of, score) contract. */
  def simhashDedupAgainst(batch: DataFrame, corpus: DataFrame,
                          maxHamming: Int = 3,
                          corpusIndex: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val best = Window.partitionBy("batch_id")
      .orderBy(col("hamming"), col("dup_of"))
    simhashMatchesAgainst(batch, corpus, maxHamming, corpusIndex)
      .withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
      .select(col("batch_id"), col("dup_of"), col("hamming"))
  }

  /** BM25 (Robertson/Sparck Jones probabilistic retrieval; the Okapi
    * k1/b form) of a LITERAL term query against the corpus. All corpus
    * statistics the formula needs — N, total token length (for avgdl),
    * and per-term document frequencies — compute in ONE one-row
    * aggregate that broadcasts onto a map-only scoring pass (the token
    * array binds once per row; per-term tf is a HOF count over it), so
    * the whole query costs two corpus scans and zero data shuffles;
    * top-k plans as a distributed TakeOrdered. ln() is 1-ulp across
    * libms → the score quantizes at 1e-6 (the tfidf discipline).
    * avgdl never materializes as a divided double: dl/avgdl evaluates
    * as dl·N/total_len from exact integer inputs. */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(terms.nonEmpty && terms.forall(t =>
      t.nonEmpty && t.forall(c => c.isLetterOrDigit || c == '_')),
      s"terms must be plain identifiers, got $terms")
    val withToks = docs.withColumn("toks", split(col("text"), " "))
    val statAggs = Seq(count(lit(1)).as("n_docs"),
      sum(size(col("toks"))).as("total_len")) ++
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df$i")
      }
    val stats = withToks.agg(statAggs.head, statAggs.tail: _*)
    val base = withToks.crossJoin(broadcast(stats))
      .withColumn("dl", size(col("toks")))
    val contribs = terms.zipWithIndex.map { case (t, i) =>
      val tf = expr(s"CAST(size(filter(toks, x -> x = '$t')) AS DOUBLE)")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col("dl") * col("n_docs") / col("total_len")))
    }
    base.withColumn("score", round(contribs.reduce(_ + _), 6))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
      .select(col("doc_id"), col("score"))
  }

  /** The dedup_lsh_pairs oracle, shared with dedup_components (which
    * computes the transitive closure over its pair output), over any
    * source relation so composed pipelines (corpus_clean) can dedup a
    * filtered split. */
  private def lshPairsOracleFor(src: String): String =
    s"""WITH mh AS (${minhashSigSqlFor(src)}),
       |bands AS (
       |  SELECT doc_id, CAST(seed // ${K / BANDS} AS INT) AS band,
       |    string_agg(CAST(minh AS VARCHAR), ',' ORDER BY seed) AS sig
       |  FROM mh GROUP BY doc_id, band),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |sh AS (${shinglesSqlFor(src)}),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.d1, c.d2, count(*) AS inter
       |  FROM cand c
       |  JOIN sh s1 ON c.d1 = s1.doc_id
       |  JOIN sh s2 ON c.d2 = s2.doc_id AND s1.shingle = s2.shingle
       |  GROUP BY c.d1, c.d2)
       |SELECT c.d1, c.d2, CAST(coalesce(i.inter, 0) AS BIGINT) AS inter,
       |  CAST(n1.n + n2.n - coalesce(i.inter, 0) AS BIGINT) AS uni,
       |  CAST(coalesce(i.inter, 0) AS DOUBLE) / (n1.n + n2.n - coalesce(i.inter, 0)) AS jaccard
       |FROM cand c
       |LEFT JOIN inter i ON c.d1 = i.d1 AND c.d2 = i.d2
       |JOIN sizes n1 ON c.d1 = n1.doc_id
       |JOIN sizes n2 ON c.d2 = n2.doc_id
       |WHERE CAST(coalesce(i.inter, 0) AS DOUBLE) / (n1.n + n2.n - coalesce(i.inter, 0)) >= 0.5""".stripMargin

  private val lshPairsOracle: String = lshPairsOracleFor("documents")

  /** txt_scrub_ngrams oracle: DuckDB twin of [[scrubFrequentNgrams]]
    * (1-based list indices; `range(i, i + n)` is DuckDB's half-open
    * form of Spark's inclusive `sequence(p, p + n - 1)`). */
  private def scrubNgramsOracle(n: Int, maxDf: Int): String = {
    val gram1 = (0 until n)
      .map(j => if (j == 0) "toks[i]" else s"toks[i + $j]").mkString(", ' ', ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, unnest(list_distinct(
       |    list_transform(range(1, len(toks) - ${n - 2}), i -> concat($gram1)))) AS gram
       |  FROM t WHERE len(toks) >= $n),
       |freq AS (SELECT gram FROM (
       |    SELECT gram, count(*) AS df FROM g GROUP BY gram) WHERE df > $maxDf),
       |pos AS (SELECT doc_id, i, concat($gram1) AS gram
       |  FROM t, LATERAL (SELECT unnest(range(1, greatest(len(toks) - ${n - 1}, 0) + 1)) AS i)),
       |hits AS (SELECT doc_id, list_distinct(flatten(list(span))) AS covered
       |  FROM (SELECT doc_id, range(i, i + $n) AS span FROM pos JOIN freq USING (gram))
       |  GROUP BY doc_id)
       |SELECT t.doc_id,
       |  CAST(len(t.toks) AS INT) AS n_tokens,
       |  CAST(coalesce(len(h.covered), 0) AS INT) AS n_removed,
       |  md5(coalesce(array_to_string(list_filter(t.toks,
       |    (x, j) -> NOT list_contains(coalesce(h.covered, CAST([] AS BIGINT[])), j)), ' '), '')) AS clean_hash
       |FROM t LEFT JOIN hits h USING (doc_id)""".stripMargin
  }

  /** dedup_substring oracle: DuckDB twin of [[exactSubstringDedup]] —
    * k-token windows by 1-based list slice, duplicated = window hash
    * seen ≥2 times corpus-wide, coverage the distinct union of
    * half-open `range(pos, pos + k)` spans (0-based positions, matching
    * Spark's posexplode; the list_filter index j is 1-based, hence
    * `j - 1`). */
  private def substringDedupOracle(k: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |w AS (SELECT doc_id, i - 1 AS pos,
       |        ${phashSql(s"array_to_string(toks[i:i+${k - 1}], ' ')")} AS h
       |      FROM t, LATERAL (SELECT unnest(range(1, greatest(len(toks) - ${k - 1}, 0) + 1)) AS i)),
       |dup AS (SELECT h FROM w GROUP BY h HAVING count(*) >= 2),
       |hits AS (SELECT doc_id, list_distinct(flatten(list(span))) AS covered
       |  FROM (SELECT doc_id, range(pos, pos + $k) AS span FROM w JOIN dup USING (h))
       |  GROUP BY doc_id)
       |SELECT t.doc_id,
       |  CAST(len(t.toks) AS INT) AS n_tokens,
       |  CAST(coalesce(len(h.covered), 0) AS INT) AS n_removed,
       |  CAST(coalesce(len(list_filter(h.covered,
       |    c -> NOT list_contains(h.covered, c - 1))), 0) AS INT) AS n_spans,
       |  md5(coalesce(array_to_string(list_filter(t.toks,
       |    (x, j) -> NOT list_contains(coalesce(h.covered, CAST([] AS BIGINT[])), j - 1)), ' '), '')) AS clean_hash
       |FROM t LEFT JOIN hits h USING (doc_id)""".stripMargin

  /** dedup_substring_keep oracle: the [[substringDedupOracle]] shape
    * with keep-one semantics — an occurrence is scrubbed iff its hash
    * repeats corpus-wide AND it is not the lexicographically-first
    * (doc_id, pos) occurrence (row_number twin of the Spark side's
    * min(struct) argmin). */
  private def substringDedupKeepOracle(k: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |w AS (SELECT doc_id, i - 1 AS pos,
       |        ${phashSql(s"array_to_string(toks[i:i+${k - 1}], ' ')")} AS h
       |      FROM t, LATERAL (SELECT unnest(range(1, greatest(len(toks) - ${k - 1}, 0) + 1)) AS i)),
       |d AS (SELECT doc_id, pos,
       |        count(*) OVER (PARTITION BY h) AS c,
       |        row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |      FROM w),
       |hits AS (SELECT doc_id, list_distinct(flatten(list(span))) AS covered
       |  FROM (SELECT doc_id, range(pos, pos + $k) AS span FROM d WHERE c >= 2 AND rn > 1)
       |  GROUP BY doc_id)
       |SELECT t.doc_id,
       |  CAST(len(t.toks) AS INT) AS n_tokens,
       |  CAST(coalesce(len(h.covered), 0) AS INT) AS n_removed,
       |  CAST(coalesce(len(list_filter(h.covered,
       |    c -> NOT list_contains(h.covered, c - 1))), 0) AS INT) AS n_spans,
       |  md5(coalesce(array_to_string(list_filter(t.toks,
       |    (x, j) -> NOT list_contains(coalesce(h.covered, CAST([] AS BIGINT[])), j - 1)), ' '), '')) AS clean_hash
       |FROM t LEFT JOIN hits h USING (doc_id)""".stripMargin

  /** dedup_substring_incr oracle: batch = odd docs, corpus index = the
    * distinct window hashes of even docs; a batch occurrence is
    * scrubbed iff its hash appears in the index. */
  private def substringDedupIncrOracle(k: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |           WHERE doc_id % 2 = 1),
       |idx AS (SELECT DISTINCT ${phashSql(s"array_to_string(toks[i:i+${k - 1}], ' ')")} AS h
       |      FROM (SELECT string_split(text, ' ') AS toks FROM documents WHERE doc_id % 2 = 0),
       |           LATERAL (SELECT unnest(range(1, greatest(len(toks) - ${k - 1}, 0) + 1)) AS i)),
       |w AS (SELECT doc_id, i - 1 AS pos,
       |        ${phashSql(s"array_to_string(toks[i:i+${k - 1}], ' ')")} AS h
       |      FROM t, LATERAL (SELECT unnest(range(1, greatest(len(toks) - ${k - 1}, 0) + 1)) AS i)),
       |hits AS (SELECT doc_id, list_distinct(flatten(list(span))) AS covered
       |  FROM (SELECT doc_id, range(pos, pos + $k) AS span FROM w JOIN idx USING (h))
       |  GROUP BY doc_id)
       |SELECT t.doc_id,
       |  CAST(len(t.toks) AS INT) AS n_tokens,
       |  CAST(coalesce(len(h.covered), 0) AS INT) AS n_removed,
       |  CAST(coalesce(len(list_filter(h.covered,
       |    c -> NOT list_contains(h.covered, c - 1))), 0) AS INT) AS n_spans,
       |  md5(coalesce(array_to_string(list_filter(t.toks,
       |    (x, j) -> NOT list_contains(coalesce(h.covered, CAST([] AS BIGINT[])), j - 1)), ' '), '')) AS clean_hash
       |FROM t LEFT JOIN hits h USING (doc_id)""".stripMargin

  /** Transitive closure of the LSH pair graph via recursive CTE (fine at
    * oracle scale; the Spark side is the O(log n) large-star/small-star
    * loop in ops.Components). Shared by dedup_components and dedup_keep. */
  private def componentsOracleFor(src: String): String =
    s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM (${lshPairsOracleFor(src)}) lsh),
       |nodes AS (SELECT d1 AS n FROM pairs UNION SELECT d2 FROM pairs),
       |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
       |          UNION SELECT d2 AS a, d1 AS b FROM pairs),
       |reach(a, b) AS (
       |  SELECT n AS a, n AS b FROM nodes
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS component
       |FROM reach GROUP BY a""".stripMargin

  private val componentsOracle: String = componentsOracleFor("documents")

  /** The dedup_keep oracle over any source: survivors = docs whose
    * cluster label (if any) is themselves; docs never paired have no
    * label row and survive. */
  private def dedupKeepSqlFor(src: String): String =
    s"""WITH comp AS (${componentsOracleFor(src)})
       |SELECT d.doc_id, md5(d.text) AS content_hash
       |FROM $src d
       |LEFT JOIN comp c ON d.doc_id = c.doc_id
       |WHERE c.component IS NULL OR c.component = d.doc_id""".stripMargin

  /** The dedup_keep_best oracle: survivor = the longest doc of each
    * cluster, ties to the smaller doc_id (row_number is the DuckDB twin
    * of the Spark side's max_by over (metric, -doc_id)); docs never
    * paired have no label row and survive. */
  private def dedupKeepBestSqlFor(src: String): String =
    s"""WITH comp AS (${componentsOracleFor(src)}),
       |labeled AS (
       |  SELECT d.doc_id, c.component, length(d.text) AS m
       |  FROM $src d JOIN comp c ON d.doc_id = c.doc_id),
       |surv AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |      row_number() OVER (PARTITION BY component ORDER BY m DESC, doc_id) AS rn
       |    FROM labeled) WHERE rn = 1)
       |SELECT d.doc_id, md5(d.text) AS content_hash
       |FROM $src d
       |LEFT JOIN comp c ON d.doc_id = c.doc_id
       |WHERE c.component IS NULL OR d.doc_id IN (SELECT doc_id FROM surv)""".stripMargin

  /** txt_repetition oracle, shared by the keep-flag twin. */
  private val repetitionOracleSql: String = {
    val gram = (n: Int) => (0 until n)
      .map(j => if (j == 0) "toks[i]" else s"toks[i + $j]").mkString(", ' ', ")
    val cols = Seq(2, 3, 4).map { n =>
      s"""CASE WHEN len(toks) >= $n THEN
         |    CAST(len(g$n) - len(list_distinct(g$n)) AS DOUBLE) / len(g$n)
         |  ELSE 0.0 END AS dup_frac_$n""".stripMargin
    }.mkString(",\n")
    val grams = Seq(2, 3, 4).map { n =>
      s"list_transform(range(1, len(toks) - ${n - 2}), i -> concat(${gram(n)})) AS g$n"
    }.mkString(",\n  ")
    s"""SELECT doc_id,
       |$cols
       |FROM (SELECT doc_id, toks, $grams
       |      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))""".stripMargin
  }

  /** corpus_clean: decontamination + quality predicate folded into ONE
    * source relation, then the dedup_keep chain over it. The quality
    * predicate mirrors [[qualityKeep]] defaults term for term. */
  /** Decontamination-survivor SELECT of the corpus_clean fixture split
    * (corpus = doc_id >= 10, bench = doc_id < 10) — shared by the
    * corpus_clean oracle and the funnel stage counts. */
  private val cleanDeconSql: String = {
    val benchSrc = "(SELECT * FROM documents WHERE doc_id < 10)"
    s"""(SELECT d.* FROM documents d
       | WHERE d.doc_id >= 10
       |  AND d.doc_id NOT IN (
       |   SELECT DISTINCT c.doc_id
       |   FROM (${ngramShinglesSqlFor("(SELECT * FROM documents WHERE doc_id >= 10)", 5)}) c
       |   JOIN (SELECT DISTINCT shingle FROM (${ngramShinglesSqlFor(benchSrc, 5)})) b
       |     USING (shingle)))""".stripMargin
  }

  /** The Gopher/C4 quality predicate over alias `d` (oracle form). */
  private val cleanQualitySql: String = {
    def toks(ref: String) = s"string_split($ref, ' ')"
    s"""len(${toks("d.text")}) >= 20
       | AND CAST(length(d.text) - (len(${toks("d.text")}) - 1) AS DOUBLE) / len(${toks("d.text")}) >= 3.0
       | AND CAST(length(d.text) - (len(${toks("d.text")}) - 1) AS DOUBLE) / len(${toks("d.text")}) <= 8.0
       | AND CAST(len(list_distinct(${toks("d.text")})) AS DOUBLE) / len(${toks("d.text")}) >= 0.35
       | AND len(list_filter(['the','a','of','and'], s -> list_contains(${toks("d.text")}, s))) >= 1""".stripMargin
  }

  /** Decon + quality survivors (corpus_clean's dedup input). */
  private val cleanSrcSql: String =
    s"(SELECT d.* FROM $cleanDeconSql d WHERE $cleanQualitySql)"

  private val corpusCleanOracle: String = dedupKeepSqlFor(cleanSrcSql)

  /** dedup_incremental oracle: the same band join + candidate-only
    * verification + best-match ranking, over the parity split. */
  private val incrementalOracle: String = {
    val batchSrc = "(SELECT * FROM documents WHERE doc_id % 2 = 1)"
    val corpusSrc = "(SELECT * FROM documents WHERE doc_id % 2 = 0)"
    s"""WITH bb AS (${bandsSqlFor(batchSrc)}),
       |cb AS (${bandsSqlFor(corpusSrc)}),
       |cand AS (
       |  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
       |  FROM bb b JOIN cb c ON b.band = c.band AND b.sig = c.sig),
       |shb AS (${shinglesSqlFor(batchSrc)}),
       |shc AS (${shinglesSqlFor(corpusSrc)}),
       |nb AS (SELECT doc_id, count(*) AS n FROM shb GROUP BY doc_id),
       |nc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
       |inter AS (
       |  SELECT cd.batch_id, cd.corpus_id, count(*) AS inter
       |  FROM cand cd
       |  JOIN shb s1 ON cd.batch_id = s1.doc_id
       |  JOIN shc s2 ON cd.corpus_id = s2.doc_id AND s1.shingle = s2.shingle
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT cd.batch_id, cd.corpus_id,
       |    CAST(coalesce(i.inter, 0) AS DOUBLE) / (n1.n + n2.n - coalesce(i.inter, 0)) AS jaccard
       |  FROM cand cd
       |  LEFT JOIN inter i ON cd.batch_id = i.batch_id AND cd.corpus_id = i.corpus_id
       |  JOIN nb n1 ON cd.batch_id = n1.doc_id
       |  JOIN nc n2 ON cd.corpus_id = n2.doc_id
       |  WHERE CAST(coalesce(i.inter, 0) AS DOUBLE) / (n1.n + n2.n - coalesce(i.inter, 0)) >= 0.5),
       |ranked AS (
       |  SELECT batch_id, corpus_id, jaccard,
       |    row_number() OVER (PARTITION BY batch_id ORDER BY jaccard DESC, corpus_id) AS rn
       |  FROM scored)
       |SELECT batch_id, corpus_id AS dup_of, jaccard FROM ranked WHERE rn = 1""".stripMargin
  }

  /** The DSIR importance-weight SQL (target = lang 'en'), shared by the
    * dsir_weights oracle and the top-k oracle built on top of it.
    * Mirrors [[dsirWeights]] term for term: hashed unigram+bigram
    * buckets (B = 4096), add-one smoothing, raw-side bucket spine. */
  private val dsirWeightsSql: String = {
    val b = 4096
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, lang, unnest(list_concat(toks,
       |        list_transform(range(1, len(toks)), i -> concat(toks[i], ' ', toks[i + 1])))) AS gram
       |      FROM t),
       |bk AS (SELECT doc_id, lang, ${phashSql("gram")} % $b AS bucket FROM g),
       |cr AS (SELECT bucket, count(*) AS cr FROM bk GROUP BY bucket),
       |ct AS (SELECT bucket, count(*) AS ct FROM bk WHERE lang = 'en' GROUP BY bucket),
       |tr AS (SELECT CAST(sum(2 * len(string_split(text, ' ')) - 1) AS DOUBLE) AS tr FROM documents),
       |tt AS (SELECT CAST(sum(2 * len(string_split(text, ' ')) - 1) AS DOUBLE) AS tt
       |       FROM documents WHERE lang = 'en'),
       |r AS (SELECT bucket,
       |        ln((coalesce(ct, 0) + 1.0) / (tt + $b)) - ln((cr + 1.0) / (tr + $b)) AS ratio
       |      FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN tt CROSS JOIN tr)
       |SELECT bk.doc_id, CAST(count(*) AS BIGINT) AS n_grams, round(sum(r.ratio), 6) AS logw
       |FROM bk JOIN r USING (bucket)
       |GROUP BY bk.doc_id""".stripMargin
  }

  /** The unigram-LM scoring SQL, shared by the txt_unigram_lm oracle
    * and the perplexity-bucket oracle built on top of it. */
  private val unigramLmSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |cnt AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM cnt)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  round(avg(-ln(cnt.cnt / tot.tot)), 6) AS nll
      |FROM toks JOIN cnt USING (tok) CROSS JOIN tot
      |GROUP BY doc_id""".stripMargin

  /** bpe_encode oracle, rendered from the merge table the query just
    * learned (absent until the query runs — the Ivf.cachedCentroids
    * pattern): each word becomes a symbol string with DOUBLED-space
    * delimiters `'  c  h  a  r  s  </w>  '`, each merge is a
    * left-to-right non-overlapping `replace(' l  r ' → ' lr ')` —
    * string replace's scan order IS BPE's greedy merge order, and the
    * doubled delimiter means adjacent occurrences (`a b a b` under
    * merge (a,b)) don't share a boundary space: each match consumes one
    * space from each flanking pair, the single-space replacement
    * restores it, so ALL non-overlapping occurrences merge exactly like
    * the engine's [[mergePairExpr]] fold. A single-space oracle merges
    * only the first of two adjacent occurrences (`replace(' a b a b ',
    * ' a b ', ' ab ')` = `' ab a b '`) and wrongly diverges. The doubled
    * spaces collapse back to single just before the final trim. */
  /** The merge-fold encode SQL over an arbitrary (doc_id, text) source
    * relation — shared by the bpe_encode oracle (src = documents) and
    * the composed corpus_tokenize oracle (src = cleaned survivors). */
  private def bpeEncodeSqlFor(merges: Seq[(Int, String, String)], src: String): String = {
    def q(s: String) = s.replace("'", "''")
    val applied = merges.sortBy(_._1)
      .foldLeft("concat('  ', regexp_replace(word, '(.)', '\\1  ', 'g'), '</w>  ')") {
        case (acc, (_, l, r)) => s"replace($acc, ' ${q(l)}  ${q(r)} ', ' ${q(l + r)} ')"
      }
    s"""WITH w AS (
       |  SELECT doc_id, i AS pos, toks[i] AS word
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src tsrc),
       |       LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i)),
       |enc AS (SELECT word, trim(replace($applied, '  ', ' ')) AS encoded
       |        FROM (SELECT DISTINCT word FROM w) v WHERE length(word) >= 1)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(string_split(encoded, ' '))) AS BIGINT) AS n_tokens,
       |  md5(string_agg(encoded, ' ' ORDER BY pos)) AS stream_hash
       |FROM w JOIN enc USING (word)
       |GROUP BY doc_id""".stripMargin
  }

  private def bpeEncodeOracles: Map[String, String] = cachedMerges match {
    case None => Map.empty
    case Some(merges) =>
      Map("bpe_encode" -> bpeEncodeSqlFor(merges, "documents"))
  }

  /** tok_fertility oracle: the merge-fold encode aggregated per
    * language (exact integer sums; DuckDB sums promote to HUGEINT,
    * hence the explicit BIGINT casts). */
  private def fertilityOracles: Map[String, String] = cachedFertilityMerges match {
    case None => Map.empty
    case Some(merges) =>
      val enc = bpeEncodeSqlFor(merges, "documents")
      Map("tok_fertility" ->
        s"""SELECT d.lang,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(e.n_words) AS BIGINT) AS n_words,
           |  CAST(sum(e.n_tokens) AS BIGINT) AS n_tokens,
           |  CAST(sum(e.n_tokens) AS DOUBLE) / CAST(sum(e.n_words) AS DOUBLE) AS fertility,
           |  CAST(sum(length(d.text)) AS DOUBLE) / CAST(sum(e.n_tokens) AS DOUBLE) AS chars_per_token
           |FROM documents d JOIN ($enc) e USING (doc_id)
           |GROUP BY d.lang""".stripMargin)
  }

  /** corpus_tokenize oracle: the corpus_clean survivor set feeds the
    * merge-fold encode (over the merges THIS run learned on the
    * survivors), whose per-doc n_tokens feed the txt_pack cumsum — the
    * three stage oracles composed verbatim, so DuckDB verifies the
    * end-to-end chunk layout, not just the stages. */
  private def corpusTokenizeOracles: Map[String, String] = cachedTokenizeMerges match {
    case None => Map.empty
    case Some(merges) =>
      val cleanedSrc =
        s"""(SELECT d.doc_id, d.text FROM documents d
           | JOIN (SELECT doc_id FROM ($corpusCleanOracle) cc) surv USING (doc_id))""".stripMargin
      val enc = bpeEncodeSqlFor(merges, cleanedSrc)
      Map("corpus_tokenize" ->
        s"""WITH t AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n FROM ($enc) e),
           |c AS (SELECT doc_id, n,
           |  CAST(sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t),
           |s AS (SELECT doc_id, n, cum, cum - n AS start FROM c),
           |x AS (SELECT doc_id, n, cum, start,
           |  unnest(range(start // 512, (cum - 1) // 512 + 1)) AS chunk_id FROM s)
           |SELECT chunk_id, doc_id,
           |  greatest(start, chunk_id * 512) - start AS off_start,
           |  least(cum, (chunk_id + 1) * 512) - greatest(start, chunk_id * 512) AS off_len
           |FROM x""".stripMargin)
  }

  /** Static oracles plus the runtime-learned BPE-encode oracle — a def
    * so Verify (which runs queries before dumping oracle SQL) sees the
    * merge literals the encode query actually used. */
  /** unigram_encode oracle, rendered from the piece table the query
    * just learned (the [[cachedMerges]] pattern): DuckDB replays the
    * Viterbi DP from the same (piece, logp) literals. */
  private def unigramEncodeOracles: Map[String, String] =
    UnigramLm.cachedPieces match {
      case None         => Map.empty
      case Some(pieces) =>
        Map("unigram_encode" -> UnigramLm.encodeOracleSql(pieces, maxPieceLen = 5))
    }

  /** wordpiece_encode oracle from the vocabulary the query just learned
    * (same cached-literal pattern). */
  private def wordpieceEncodeOracles: Map[String, String] =
    WordPiece.cachedVocab match {
      case None        => Map.empty
      case Some(vocab) =>
        Map("wordpiece_encode" -> WordPiece.encodeOracleSql(vocab))
    }

  def oracles: Map[String, String] =
    staticOracles ++ bpeEncodeOracles ++ fertilityOracles ++
      unigramEncodeOracles ++ wordpieceEncodeOracles ++
      corpusTokenizeOracles ++ tempMixOracles ++ tokenMixOracles ++ qcOracles ++
      outlierOracles

  /** quality_outliers oracle from the driver-computed fence literals
    * (absent until the query runs). */
  private def outlierOracles: Map[String, String] = cachedOutlierFences match {
    case None => Map.empty
    case Some((tl, th, wl, wh)) =>
      Map("quality_outliers" ->
        s"""WITH s AS (SELECT doc_id,
           |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |  round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
           |    / len(string_split(text, ' ')), 6) AS mean_word_len
           |FROM documents)
           |SELECT doc_id, n_tokens, mean_word_len,
           |  (n_tokens < $tl OR n_tokens > $th) AS len_outlier,
           |  (mean_word_len < $wl OR mean_word_len > $wh) AS wl_outlier,
           |  (NOT (n_tokens < $tl OR n_tokens > $th)
           |   AND NOT (mean_word_len < $wl OR mean_word_len > $wh)) AS kept
           |FROM s""".stripMargin)
  }

  private val staticOracles: Map[String, String] = Map(
    "dedup_incremental" -> incrementalOracle,

    "corpus_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN h < 980000 THEN 'train'
         |       WHEN h < 990000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |        ${phashSql("concat('split_', CAST(doc_id AS VARCHAR))")} % 1000000 AS h
         |      FROM documents)""".stripMargin,

    "corpus_shuffle" ->
      s"""WITH h AS (SELECT doc_id,
         |  ${phashSql("concat('epoch1_', CAST(doc_id AS VARCHAR))")} AS h FROM documents),
         |r AS (SELECT doc_id, row_number() OVER (ORDER BY h, doc_id) - 1 AS rk FROM h)
         |SELECT doc_id, CAST(rk % 64 AS BIGINT) AS shard,
         |  CAST(rk // 64 AS BIGINT) AS pos FROM r""".stripMargin,

    "source_stats" ->
      """WITH t AS (SELECT source, text, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT source,
        |  CAST(len(toks) >= 20 AND (CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks)) BETWEEN 3.0 AND 8.0
        |    AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.35
        |    AND len(list_filter(['the','a','of','and'], s -> list_contains(toks, s))) >= 1 AS INT) AS keep,
        |  CAST(len(toks) AS BIGINT) AS n_tokens, md5(text) AS content_hash FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  round(avg(keep), 6) AS keep_rate,
        |  round((count(*) - count(DISTINCT content_hash)) / CAST(count(*) AS DOUBLE), 6) AS dup_rate
        |FROM m GROUP BY source""".stripMargin,

    "source_filter" ->
      """WITH t AS (SELECT doc_id, source, text, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id, source,
        |  CAST(len(toks) >= 20 AND (CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks)) BETWEEN 3.0 AND 8.0
        |    AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.35
        |    AND len(list_filter(['the','a','of','and'], s -> list_contains(toks, s))) >= 1 AS INT) AS keep,
        |  md5(text) AS content_hash FROM t),
        |st AS (SELECT source, round(avg(keep), 6) AS keep_rate,
        |  round((count(*) - count(DISTINCT content_hash)) / CAST(count(*) AS DOUBLE), 6) AS dup_rate
        |  FROM m GROUP BY source),
        |bad AS (SELECT source FROM st WHERE keep_rate < 0.55 OR dup_rate > 0.5)
        |SELECT doc_id, source FROM m WHERE source NOT IN (SELECT source FROM bad)""".stripMargin,

    "txt_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |uc AS (SELECT tok, count(*) AS ucnt
        |       FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY tok),
        |tot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS tot FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |                i -> concat(toks[i], ' ', toks[i + 1]))) AS bg
        |       FROM t WHERE len(toks) >= 2),
        |bc AS (SELECT bg, count(*) AS bcnt FROM bg GROUP BY bg),
        |bp AS (SELECT bc.bg, bc.bcnt, uc.ucnt AS lcnt
        |       FROM bc JOIN uc ON string_split(bc.bg, ' ')[1] = uc.tok)
        |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
        |  round(avg(-ln(CASE WHEN bp.bcnt IS NOT NULL
        |                     THEN CAST(bp.bcnt AS DOUBLE) / bp.lcnt
        |                     ELSE 0.4 * coalesce(r.ucnt, 0.5) / tot.tot END)), 6) AS nll2
        |FROM bg
        |LEFT JOIN bp USING (bg)
        |LEFT JOIN uc r ON string_split(bg.bg, ' ')[2] = r.tok
        |CROSS JOIN tot
        |GROUP BY bg.doc_id""".stripMargin,

    "txt_kn_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |allg AS (SELECT unnest(list_transform(range(1, len(toks)),
        |                 i -> concat(toks[i], ' ', toks[i + 1]))) AS bg FROM t),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |              i -> concat(toks[i], ' ', toks[i + 1]))) AS bg
        |      FROM t WHERE len(toks) >= 2),
        |bc AS (SELECT bg, count(*) AS bcnt FROM allg GROUP BY bg),
        |lc AS (SELECT string_split(bg, ' ')[1] AS lw, count(*) AS lcnt FROM allg GROUP BY 1),
        |pairs AS (SELECT DISTINCT string_split(bg, ' ')[1] AS lw, string_split(bg, ' ')[2] AS rw
        |          FROM allg),
        |cl AS (SELECT lw, count(*) AS cont_l FROM pairs GROUP BY lw),
        |cr2 AS (SELECT rw, count(*) AS cont_r FROM pairs GROUP BY rw),
        |ty AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM (SELECT DISTINCT bg FROM allg)),
        |lt AS (SELECT lc.lw, lc.lcnt, coalesce(cl.cont_l, 0) AS cont_l
        |       FROM lc LEFT JOIN cl USING (lw))
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
        |  round(avg(-ln(
        |    greatest(coalesce(bc.bcnt, 0) - 0.75, 0.0) / lt.lcnt
        |    + 0.75 * lt.cont_l / lt.lcnt * (coalesce(cr2.cont_r, 0.5) / ty.n_types))), 6) AS nll_kn
        |FROM g
        |LEFT JOIN bc USING (bg)
        |JOIN lt ON string_split(g.bg, ' ')[1] = lt.lw
        |LEFT JOIN cr2 ON string_split(g.bg, ' ')[2] = cr2.rw
        |CROSS JOIN ty
        |GROUP BY g.doc_id""".stripMargin,

    // order-n interpolated KN: every model table derives from the ONE
    // n-gram count table; the oracle SQL is generated by the same loop
    // structure as the engine derivation (unpruned at oracle scale, so
    // the lambda-1 pruning arms are dead here — spec-pinned instead)
    "txt_kn_lm_3" -> knOracleSql(3),
    "txt_kn_lm_5" -> knOracleSql(5),

    "txt_dup_coverage" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, i AS pos, concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]) AS gram
        |      FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i)),
        |d AS (SELECT doc_id, gram FROM g GROUP BY doc_id, gram HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT g.doc_id, u.idx
        |        FROM g JOIN d USING (doc_id, gram),
        |             LATERAL (SELECT unnest(range(g.pos, g.pos + 3)) AS idx) u),
        |cchars AS (SELECT cov.doc_id, sum(length(t.toks[cov.idx])) AS cc
        |           FROM cov JOIN t USING (doc_id) GROUP BY cov.doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
        |  round(coalesce(cchars.cc, 0) /
        |        CAST(length(d2.text) - (len(t.toks) - 1) AS DOUBLE), 6) AS dup_char_frac
        |FROM t JOIN documents d2 USING (doc_id)
        |LEFT JOIN cchars USING (doc_id)""".stripMargin,

    "txt_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY doc_id, tok)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  round(ln(CAST(sum(c) AS DOUBLE)) -
        |        sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / sum(c), 6) AS entropy
        |FROM c GROUP BY doc_id""".stripMargin,

    "dsir_weights" -> dsirWeightsSql,
    "dsir_topk" ->
      s"""SELECT * FROM ($dsirWeightsSql)
         |ORDER BY logw DESC, doc_id LIMIT 200""".stripMargin,

    "txt_decontaminate" -> {
      val benchSrc = "(SELECT * FROM documents WHERE doc_id < 10)"
      val corpusSrc = "(SELECT * FROM documents WHERE doc_id >= 10)"
      s"""WITH bsh AS (SELECT DISTINCT shingle FROM (${ngramShinglesSqlFor(benchSrc, 5)})),
         |csh AS (${ngramShinglesSqlFor(corpusSrc, 5)}),
         |bad AS (SELECT DISTINCT doc_id FROM csh JOIN bsh USING (shingle))
         |SELECT d.doc_id, md5(d.text) AS content_hash
         |FROM documents d
         |WHERE d.doc_id >= 10 AND d.doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin
    },

    "txt_contain_frac" -> {
      val benchSrc = "(SELECT * FROM documents WHERE doc_id < 10)"
      val corpusSrc = "(SELECT * FROM documents WHERE doc_id >= 10)"
      s"""WITH bsh AS (SELECT DISTINCT shingle FROM (${ngramShinglesSqlFor(benchSrc, 5)})),
         |csh AS (${ngramShinglesSqlFor(corpusSrc, 5)})
         |SELECT c.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN b.shingle IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_contaminated,
         |  round(CAST(sum(CASE WHEN b.shingle IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
         |        / count(*), 6) AS contain_frac
         |FROM csh c LEFT JOIN bsh b ON c.shingle = b.shingle
         |GROUP BY c.doc_id""".stripMargin
    },

    "txt_signals" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |g AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS frac_distinct,
        |  round(CAST(sum(length(tok) * c) AS DOUBLE) / sum(c), 6) AS mean_word_len,
        |  CAST(sum(CASE WHEN tok IN ('the', 'a', 'of', 'and') THEN 1 ELSE 0 END) AS INT) AS stop_distinct,
        |  round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(CAST(c AS DOUBLE))) / sum(c), 6) AS entropy
        |FROM g GROUP BY doc_id""".stripMargin,

    "txt_winnow" ->
      s"""WITH $winnowFpsOracleCtes
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |  CAST(len(fps) AS BIGINT) AS n_fingerprints,
         |  md5(array_to_string(list_transform(list_sort(fps), x -> CAST(x AS VARCHAR)), ' ')) AS fp_hash
         |FROM f""".stripMargin,

    "dedup_winnow_incr" ->
      s"""WITH $winnowFpsOracleCtes,
         |bx AS (SELECT doc_id AS batch_id, len(fps) AS n_fps, unnest(fps) AS fp
         |       FROM f WHERE doc_id % 2 = 1),
         |cx AS (SELECT doc_id AS dup_of, unnest(fps) AS fp
         |       FROM f WHERE doc_id % 2 = 0),
         |m AS (SELECT batch_id, dup_of, max(n_fps) AS n_fps, count(*) AS n_shared
         |      FROM bx JOIN cx USING (fp) GROUP BY batch_id, dup_of),
         |r AS (SELECT batch_id, dup_of, n_shared, n_fps,
         |        row_number() OVER (PARTITION BY batch_id ORDER BY n_shared DESC, dup_of) AS rn
         |      FROM m)
         |SELECT batch_id, dup_of, CAST(n_shared AS BIGINT) AS n_shared,
         |  CAST(n_fps AS BIGINT) AS n_fps
         |FROM r WHERE rn = 1""".stripMargin,

    "dedup_editdist_incr" ->
      s"""WITH $winnowFpsOracleCtes,
         |bx AS (SELECT doc_id AS batch_id, len(fps) AS n_fps, unnest(fps) AS fp
         |       FROM f WHERE doc_id % 2 = 1),
         |cx AS (SELECT doc_id AS dup_of, unnest(fps) AS fp
         |       FROM f WHERE doc_id % 2 = 0),
         |m AS (SELECT batch_id, dup_of, count(*) AS n_shared
         |      FROM bx JOIN cx USING (fp) GROUP BY batch_id, dup_of),
         |r AS (SELECT batch_id, dup_of, n_shared,
         |        row_number() OVER (PARTITION BY batch_id ORDER BY n_shared DESC, dup_of) AS rn
         |      FROM m),
         |v AS (SELECT b.batch_id, b.dup_of, CAST(b.n_shared AS BIGINT) AS n_shared,
         |        CAST(levenshtein(x.text, y.text) AS BIGINT) AS dist,
         |        CAST(greatest(length(x.text), length(y.text)) AS BIGINT) AS max_len
         |      FROM r b JOIN documents x ON b.batch_id = x.doc_id
         |               JOIN documents y ON b.dup_of = y.doc_id
         |      WHERE b.rn = 1)
         |SELECT batch_id, dup_of, n_shared, dist,
         |  CASE WHEN max_len = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE (max_len - dist) * 1000000 // max_len END AS sim_ppm
         |FROM v
         |WHERE (CASE WHEN max_len = 0 THEN 1000000
         |            ELSE (max_len - dist) * 1000000 // max_len END) >= 500000""".stripMargin,

    "txt_normalize" ->
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN length(norm) = 0 THEN 0
        |       ELSE len(string_split(norm, ' ')) END AS BIGINT) AS n_tokens_norm,
        |  md5(norm) AS norm_hash
        |FROM n""".stripMargin,

    // position scan, not replace-counting: the automaton counts
    // OVERLAPPING occurrences ('a a' in 'a a a' = 2) and replace would
    // merge them (the bpe_encode-oracle lesson)
    "txt_blocklist" ->
      """WITH p AS (SELECT unnest(['dup', 'slow query', 'big data', 'a a']) AS ph),
        |t AS (SELECT doc_id, lower(text) AS tl FROM documents),
        |m AS (SELECT doc_id, ph,
        |        len(list_filter(range(1, len(tl) - len(ph) + 2),
        |          i -> substr(tl, CAST(i AS INT), len(ph)) = ph)) AS c
        |      FROM t, p)
        |SELECT doc_id,
        |  CAST(sum(c) AS INT) AS n_hits,
        |  CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS INT) AS n_phrases_hit,
        |  (sum(c) = 0) AS kept
        |FROM m GROUP BY doc_id""".stripMargin,

    // the span oracle addresses code points in the lowercased text —
    // DuckDB substr/len and the automaton's lead-byte counting agree
    "txt_blocklist_spans" ->
      """WITH p AS (SELECT unnest(['dup', 'slow query', 'big data', 'a a']) AS ph),
        |t AS (SELECT doc_id, lower(text) AS tl FROM documents),
        |m AS (SELECT doc_id, ph,
        |        unnest(list_filter(range(1, len(tl) - len(ph) + 2),
        |          i -> substr(tl, CAST(i AS INT), len(ph)) = ph)) AS pos
        |      FROM t, p)
        |SELECT doc_id, ph AS phrase, CAST(pos AS INT) AS pos FROM m""".stripMargin,

    // redaction replayed positionally: covered code points from the
    // span scan, runs detected via lag, one placeholder per run start
    "txt_blocklist_redact" ->
      """WITH p AS (SELECT unnest(['dup', 'slow query', 'big data', 'a a']) AS ph),
        |t AS (SELECT doc_id, lower(text) AS tl FROM documents),
        |m AS (SELECT doc_id, ph,
        |        unnest(list_filter(range(1, len(tl) - len(ph) + 2),
        |          i -> substr(tl, CAST(i AS INT), len(ph)) = ph)) AS pos
        |      FROM t, p),
        |cov AS (SELECT DISTINCT doc_id, pos + u AS cp
        |        FROM (SELECT doc_id, pos, unnest(range(0, len(ph))) AS u FROM m)),
        |c AS (SELECT doc_id, unnest(range(1, len(tl) + 1)) AS i, tl FROM t),
        |g AS (SELECT c.doc_id, c.i,
        |        substr(c.tl, CAST(c.i AS INT), 1) AS ch,
        |        cov.cp IS NOT NULL AS covd
        |      FROM c LEFT JOIN cov ON c.doc_id = cov.doc_id AND c.i = cov.cp),
        |r AS (SELECT doc_id, i, ch, covd,
        |        lag(covd, 1, false) OVER (PARTITION BY doc_id ORDER BY i) AS pcovd
        |      FROM g),
        |agg AS (SELECT doc_id,
        |        string_agg(CASE WHEN covd AND NOT pcovd THEN '<blocked>'
        |                        WHEN covd THEN ''
        |                        ELSE ch END, '' ORDER BY i) AS clean_text
        |      FROM r GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(agg.clean_text, '') AS clean_text
        |FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id""".stripMargin,

    "dedup_winnow_pairs" -> {
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |h AS (SELECT doc_id, list_transform(
         |        list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
         |          i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])),
         |        g -> ${phashSql("g")}) AS hashes
         |      FROM t),
         |f AS (SELECT doc_id, unnest(
         |        CASE WHEN len(hashes) = 0 THEN CAST([] AS BIGINT[])
         |        ELSE list_distinct(list_transform(
         |          range(1, greatest(len(hashes) - 3, 1) + 1),
         |          i -> list_min(list_slice(hashes, CAST(i AS INT), CAST(i + 3 AS INT))))) END) AS fp
         |      FROM h)
         |SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS n_shared
         |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |HAVING count(*) >= 2""".stripMargin
    },

    "txt_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, j AS chunk_id,
        |        list_slice(toks, CAST(j * 48 + 1 AS INT), CAST(j * 48 + 64 AS INT)) AS chunk
        |      FROM t, LATERAL (SELECT unnest(range(0,
        |        (greatest(len(toks) - 64, 0) + 47) // 48 + 1)) AS j))
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(len(chunk) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_hash
        |FROM c""".stripMargin,

    "bloom_dedup" ->
      s"""WITH pos AS (SELECT doc_id, list_distinct(list_transform(range(0, 5),
         |        i -> ${phashSql("concat(text, '#bloom', i)")} % ${1L << 24})) AS ps
         |      FROM documents),
         |bits AS (SELECT DISTINCT unnest(ps) AS bit FROM pos WHERE doc_id % 2 = 0),
         |probe AS (SELECT doc_id, unnest(ps) AS bit FROM pos)
         |SELECT p.doc_id,
         |  count(*) = sum(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS bloom_hit
         |FROM probe p LEFT JOIN bits b ON p.bit = b.bit
         |GROUP BY p.doc_id""".stripMargin,

    "corpus_mix" ->
      """WITH r AS (SELECT doc_id, lang, n_chars,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS INT) AS mix_rank
        |FROM documents)
        |SELECT doc_id, lang, mix_rank FROM r
        |WHERE mix_rank <= CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 30
        |  WHEN 'fr' THEN 30 WHEN 'es' THEN 20 WHEN 'zh' THEN 20 ELSE 0 END""".stripMargin,

    "txt_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_words,
        |  CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks) AS mean_word_len,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS frac_distinct,
        |  CAST(len(list_filter(['the','a','of','and'], s -> list_contains(toks, s))) AS INT) AS stop_distinct
        |FROM t)
        |SELECT doc_id, n_words, mean_word_len, frac_distinct, stop_distinct,
        |  (n_words >= 20 AND mean_word_len >= 3.0 AND mean_word_len <= 8.0
        |    AND frac_distinct >= 0.35 AND stop_distinct >= 1) AS keep
        |FROM m""".stripMargin,

    "txt_top_ngram" ->
      """WITH t AS (SELECT doc_id, length(text) AS lc, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, lc,
        |  unnest([toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS gram FROM t),
        |c AS (SELECT doc_id, lc, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3),
        |w AS (SELECT doc_id, lc, gram, cnt,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rn,
        |  CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n_grams,
        |  count(*) OVER (PARTITION BY doc_id) AS n_distinct_grams
        |FROM c)
        |SELECT doc_id, gram AS top_gram, cnt AS top_cnt, n_grams, n_distinct_grams,
        |  CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams AS dup_gram_frac,
        |  CAST(cnt * length(gram) AS DOUBLE) / lc AS top_char_frac
        |FROM w WHERE rn = 1""".stripMargin,

    "txt_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(length(text) AS INT) AS len_chars,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_tok_len,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('the', 'a', 'of', 'and'))) AS INT) AS n_stop,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS stop_ratio
        |FROM documents""".stripMargin,

    "txt_langid" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks, text FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS en,
        |  len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS de,
        |  len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS fr,
        |  len(list_filter(toks, x -> x IN ('el','los','las','y','es'))) AS es,
        |  len(regexp_extract_all(text, '[一-鿿]')) AS zh
        |FROM t)
        |SELECT doc_id,
        |  CASE WHEN zh > 0 THEN 'zh'
        |    WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
        |    WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
        |    WHEN fr >= es AND fr > 0 THEN 'fr'
        |    WHEN es > 0 THEN 'es'
        |    ELSE 'und' END AS pred_lang,
        |  lang AS label_lang
        |FROM sc""".stripMargin,

    "txt_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9一-鿿]+', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_minhash_sig" ->
      s"SELECT doc_id, CAST(seed AS INT) AS seed, CAST(minh AS BIGINT) AS minh FROM ($minhashSigSql)",

    "dedup_lsh_pairs" -> lshPairsOracle,

    "dedup_components" -> componentsOracle,

    "dedup_stats" ->
      s"""WITH comp AS ($componentsOracle),
         |sizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
         |SELECT cluster_size, count(*) AS n_clusters FROM sizes GROUP BY cluster_size""".stripMargin,

    "dedup_keep" -> dedupKeepSqlFor("documents"),

    "dedup_keep_best" -> dedupKeepBestSqlFor("documents"),

    "txt_repetition" -> repetitionOracleSql,

    "txt_repetition_keep" ->
      s"""SELECT doc_id,
         |  (dup_frac_2 <= 0.2 AND dup_frac_3 <= 0.18 AND dup_frac_4 <= 0.16) AS keep
         |FROM ($repetitionOracleSql)""".stripMargin,

    "txt_pack" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |c AS (SELECT doc_id, n,
        |  CAST(sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t),
        |s AS (SELECT doc_id, n, cum, cum - n AS start FROM c),
        |x AS (SELECT doc_id, n, cum, start,
        |  unnest(range(start // 512, (cum - 1) // 512 + 1)) AS chunk_id FROM s)
        |SELECT chunk_id, doc_id,
        |  greatest(start, chunk_id * 512) - start AS off_start,
        |  least(cum, (chunk_id + 1) * 512) - greatest(start, chunk_id * 512) AS off_len
        |FROM x""".stripMargin,

    "txt_bpeish" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '${BpeishPattern.replace("'", "''")}')) AS INT) AS bpeish_tokens
         |FROM documents""".stripMargin,

    "corpus_clean" -> corpusCleanOracle,

    "corpus_funnel" ->
      s"""SELECT
         |  (SELECT count(*) FROM documents WHERE doc_id >= 10) AS n_input,
         |  (SELECT count(*) FROM $cleanDeconSql x) AS n_decontaminated,
         |  (SELECT count(*) FROM $cleanSrcSql y) AS n_quality,
         |  (SELECT count(*) FROM ($corpusCleanOracle) z) AS n_dedup""".stripMargin,

    "dedup_jaccard_brute" ->
      s"""WITH sh AS (SELECT * FROM ($shinglesSql) WHERE doc_id < 200),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT s1.doc_id AS d1, s2.doc_id AS d2, count(*) AS inter
         |  FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2,
         |  CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) AS jaccard
         |FROM inter i
         |JOIN sizes n1 ON i.d1 = n1.doc_id
         |JOIN sizes n2 ON i.d2 = n2.doc_id
         |WHERE CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) >= 0.02""".stripMargin,

    "txt_vocab_topk" ->
      """SELECT tok, count(*) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok ORDER BY freq DESC, tok LIMIT 50""".stripMargin,

    // exact long sums of micro-unit quantized logs; doubles only in the
    // final combine (same expression shape as the engine — n*sxy would
    // overflow BIGINT at production token totals)
    "txt_zipf" ->
      """WITH v AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq
        |      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |      GROUP BY tok),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size,
        |               CAST(sum(freq) AS BIGINT) AS total_tokens FROM v),
        |top AS (SELECT freq, CAST(row_number() OVER (ORDER BY freq DESC, tok) AS BIGINT) AS rank
        |        FROM v ORDER BY freq DESC, tok LIMIT 1000),
        |q AS (SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS xq,
        |             CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6) AS BIGINT) AS yq,
        |             freq FROM top),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(xq) AS BIGINT) AS sx,
        |             CAST(sum(yq) AS BIGINT) AS sy, CAST(sum(xq * yq) AS BIGINT) AS sxy,
        |             CAST(sum(xq * xq) AS BIGINT) AS sxx,
        |             CAST(sum(freq) AS BIGINT) AS top_freq FROM q)
        |SELECT vocab_size, total_tokens,
        |  CAST(floor(CAST(top_freq AS DOUBLE) / CAST(total_tokens AS DOUBLE) * 1e6) AS BIGINT) AS topv_coverage_ppm,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope,
        |  round((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) / 1e6, 6) AS zipf_intercept
        |FROM s CROSS JOIN tot""".stripMargin,

    "txt_heaps" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |pd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM t),
        |fw AS (SELECT w, min(doc_id) AS doc_id
        |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |       GROUP BY w),
        |nt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS new_types FROM fw GROUP BY doc_id),
        |c AS (SELECT sum(pd.n_toks) OVER (ORDER BY pd.doc_id) AS ct,
        |             sum(coalesce(nt.new_types, 0)) OVER (ORDER BY pd.doc_id) AS cv
        |      FROM pd LEFT JOIN nt ON pd.doc_id = nt.doc_id),
        |q AS (SELECT CAST(round(ln(CAST(ct AS DOUBLE)) * 1e6) AS BIGINT) AS xq,
        |             CAST(round(ln(CAST(cv AS DOUBLE)) * 1e6) AS BIGINT) AS yq
        |      FROM c WHERE ct >= 1 AND cv >= 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(xq) AS sx, sum(yq) AS sy,
        |             sum(xq * yq) AS sxy, sum(xq * xq) AS sxx FROM q),
        |tot AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS total_tokens FROM t),
        |vs AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size FROM fw)
        |SELECT total_tokens, vocab_size,
        |  CASE WHEN n < 2 THEN NULL ELSE
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END AS heaps_beta,
        |  CASE WHEN n < 2 THEN NULL ELSE
        |  round((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) / 1e6, 6) END AS heaps_logk
        |FROM s CROSS JOIN tot CROSS JOIN vs""".stripMargin,

    "txt_pmi" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |tot AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS n_toks,
        |               CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS n_bigrams FROM t),
        |vc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |       GROUP BY w),
        |bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
        |       FROM t, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i)),
        |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
        |       FROM bg GROUP BY w1, w2 HAVING count(*) >= 5)
        |SELECT pc.w1, pc.w2, pc.n_pair,
        |  round(ln((CAST(pc.n_pair AS DOUBLE) * CAST(tot.n_toks AS DOUBLE) * CAST(tot.n_toks AS DOUBLE))
        |    / (CAST(tot.n_bigrams AS DOUBLE) * CAST(c1.c AS DOUBLE) * CAST(c2.c AS DOUBLE))), 6) AS pmi
        |FROM pc JOIN vc c1 ON pc.w1 = c1.w JOIN vc c2 ON pc.w2 = c2.w CROSS JOIN tot""".stripMargin,

    "corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS h_old FROM documents
        |           WHERE doc_id % 10 <> 9),
        |n AS (SELECT doc_id,
        |        md5(CASE WHEN doc_id % 10 = 3 THEN text || ' v2' ELSE text END) AS h_new
        |      FROM documents WHERE doc_id % 10 <> 4)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs FROM (
        |  SELECT CASE WHEN h_old IS NULL THEN 'added'
        |              WHEN h_new IS NULL THEN 'removed'
        |              WHEN h_old <> h_new THEN 'changed'
        |              ELSE 'unchanged' END AS status
        |  FROM o FULL OUTER JOIN n USING (doc_id)) t
        |GROUP BY status""".stripMargin,

    "vocab_drift" -> {
      val K = 1001
      def termSql(cn: String, co: String) =
        s"""CAST(round(((CAST($cn + 1 AS DOUBLE) / CAST(n_n + $K AS DOUBLE)) *
           | ln((CAST($cn + 1 AS DOUBLE) * CAST(n_o + $K AS DOUBLE)) /
           |    (CAST($co + 1 AS DOUBLE) * CAST(n_n + $K AS DOUBLE)))) * 1e9) AS BIGINT)"""
          .stripMargin
      s"""WITH od AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 9),
         |nd AS (SELECT doc_id,
         |         CASE WHEN doc_id % 10 = 3 THEN text || ' v2' ELSE text END AS text
         |       FROM documents WHERE doc_id % 10 <> 4),
         |vo AS (SELECT w, CAST(count(*) AS BIGINT) AS c_o
         |       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM od) GROUP BY w),
         |vn AS (SELECT w, CAST(count(*) AS BIGINT) AS c_n
         |       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM nd) GROUP BY w),
         |j AS (SELECT coalesce(vo.w, vn.w) AS w, coalesce(c_o, 0) AS c_o,
         |        coalesce(c_n, 0) AS c_n
         |      FROM vo FULL OUTER JOIN vn ON vo.w = vn.w),
         |top AS (SELECT * FROM j ORDER BY c_o + c_n DESC, w LIMIT 1000),
         |tot AS (SELECT (SELECT CAST(sum(c_o) AS BIGINT) FROM j) AS n_o,
         |               (SELECT CAST(count(*) AS BIGINT) FROM vo) AS v_o,
         |               (SELECT CAST(sum(c_n) AS BIGINT) FROM j) AS n_n,
         |               (SELECT CAST(count(*) AS BIGINT) FROM vn) AS v_n),
         |ta AS (SELECT CAST(sum(${termSql("c_n", "c_o")}) AS BIGINT) AS kl_top_nano,
         |         CAST(sum(c_o) AS BIGINT) AS top_c_o,
         |         CAST(sum(c_n) AS BIGINT) AS top_c_n
         |       FROM top CROSS JOIN tot)
         |SELECT n_o AS n_tokens_old, n_n AS n_tokens_new,
         |  v_o AS vocab_old, v_n AS vocab_new,
         |  kl_top_nano + ${termSql("n_n - top_c_n", "n_o - top_c_o")} AS kl_nano
         |FROM tot CROSS JOIN ta""".stripMargin
    },

    "txt_charclass" -> {
      def cnt(c: String) = s"CAST(len(regexp_extract_all(text, '$c')) AS BIGINT)"
      def ppm(c: String) =
        s"CAST(CASE WHEN length(text) = 0 THEN 0 ELSE ($c * 1000000) // length(text) END AS BIGINT)"
      val other = s"(length(text) - ${charClasses.map(c => cnt(c._2)).mkString(" - ")})"
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         |  ${charClasses.map { case (n, c) => ppm(cnt(c)) + s" AS ${n}_ppm" }.mkString(",\n  ")},
         |  ${ppm(other)} AS other_ppm
         |FROM documents""".stripMargin
    },

    "corpus_percentiles" -> {
      val sigSql =
        """SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          |  round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
          |    / len(string_split(text, ' ')), 6) AS mean_word_len FROM documents""".stripMargin
      val cells = for {
        c <- Seq("n_tokens", "mean_word_len")
        (pct, q) <- Seq((5, "0.05"), (25, "0.25"), (50, "0.5"), (75, "0.75"), (95, "0.95"))
      } yield
        s"SELECT '$c' AS signal, $pct AS q_pct, round(quantile_cont($c, $q), 6) AS value FROM s"
      s"WITH s AS ($sigSql)\n" + cells.mkString("\nUNION ALL\n")
    },

    "txt_readability" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
        |  CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS BIGINT) AS n_syllables
        |FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6) AS flesch_ease,
        |  round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) - 15.59, 6) AS fk_grade
        |FROM c""".stripMargin,

    "dedup_editdist_pairs" -> {
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |h AS (SELECT doc_id, list_transform(
         |        list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
         |          i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])),
         |        g -> ${phashSql("g")}) AS hashes
         |      FROM t),
         |f AS (SELECT doc_id, unnest(
         |        CASE WHEN len(hashes) = 0 THEN CAST([] AS BIGINT[])
         |        ELSE list_distinct(list_transform(
         |          range(1, greatest(len(hashes) - 3, 1) + 1),
         |          i -> list_min(list_slice(hashes, CAST(i AS INT), CAST(i + 3 AS INT))))) END) AS fp
         |      FROM h),
         |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS n_shared
         |         FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |         GROUP BY a.doc_id, b.doc_id
         |         HAVING count(*) >= 2),
         |v AS (SELECT c.d1, c.d2, c.n_shared,
         |        CAST(levenshtein(x.text, y.text) AS BIGINT) AS dist,
         |        CAST(greatest(length(x.text), length(y.text)) AS BIGINT) AS max_len
         |      FROM cand c JOIN documents x ON c.d1 = x.doc_id
         |                  JOIN documents y ON c.d2 = y.doc_id)
         |SELECT d1, d2, n_shared, dist,
         |  CASE WHEN max_len = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE (max_len - dist) * 1000000 // max_len END AS sim_ppm
         |FROM v
         |WHERE (CASE WHEN max_len = 0 THEN 1000000
         |            ELSE (max_len - dist) * 1000000 // max_len END) >= 500000""".stripMargin
    },

    "txt_unigram_lm" -> unigramLmSql,

    "txt_ppl_buckets" ->
      s"""WITH u AS ($unigramLmSql),
         |b AS (SELECT doc_id, nll,
         |  CAST(ntile(3) OVER (ORDER BY nll, doc_id) AS INT) AS bucket FROM u)
         |SELECT doc_id, nll, bucket,
         |  CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS band
         |FROM b""".stripMargin,

    "txt_scrub_ngrams" -> scrubNgramsOracle(n = 3, maxDf = 5),
    "dedup_substring" -> substringDedupOracle(k = 50),
    "dedup_substring_keep" -> substringDedupKeepOracle(k = 50),
    "dedup_substring_incr" -> substringDedupIncrOracle(k = 50),

    "bpe_pairs" ->
      """WITH wf AS (
        |  SELECT word, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY word),
        |p AS (SELECT freq, unnest(list_transform(range(1, length(word) + 1),
        |    i -> concat(substring(word, i, 1), ' ',
        |         CASE WHEN i = length(word) THEN '</w>'
        |              ELSE substring(word, i + 1, 1) END))) AS pair
        |  FROM wf WHERE length(word) >= 1)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
        |FROM p GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin,

    "corpus_sample" -> {
      val cases = Seq("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5,
        "src3" -> 0.25, "src4" -> 0.1)
        .map { case (k, v) => s"WHEN '$k' THEN ${math.round(v * 1000000L)}" }
        .mkString(" ")
      s"""SELECT doc_id, source FROM documents
         |WHERE ${phashSql("concat('smp_', CAST(doc_id AS VARCHAR))")} % 1000000
         |  < (CASE source $cases ELSE ${math.round(0.05 * 1000000L)} END)""".stripMargin
    },

    "corpus_upsample" -> {
      val cases = Seq("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.4)
        .map { case (k, v) => s"WHEN '$k' THEN ${math.round(v * 1000000L)}" }
        .mkString(" ")
      s"""WITH w AS (
         |  SELECT doc_id, source,
         |    (CASE source $cases ELSE 0 END) AS wppm
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source,
         |    wppm // 1000000 +
         |    CASE WHEN ${phashSql("concat('ups_', CAST(doc_id AS VARCHAR))")} % 1000000
         |         < wppm % 1000000 THEN 1 ELSE 0 END AS n
         |  FROM w)
         |SELECT doc_id, source, unnest(range(1, n + 1)) AS copy
         |FROM c WHERE n > 0""".stripMargin
    },

    "txt_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY doc_id, tok),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
        |SELECT tf.doc_id, tf.tok, round(tf.tf * ln(n.n / df.df), 6) AS tfidf
        |FROM tf JOIN df USING (tok) CROSS JOIN n
        |WHERE tf.doc_id < 50""".stripMargin,

    "data_profile" ->
      """SELECT 'l_quantity' AS column, count(*) AS n,
        |  min(l_quantity) AS min_v, max(l_quantity) AS max_v,
        |  CAST(sum(CAST(round(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS sum_e4,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS median
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', count(*), min(l_extendedprice), max(l_extendedprice),
        |  CAST(sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) AS BIGINT),
        |  round(quantile_cont(l_extendedprice, 0.5), 6)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_discount', count(*), min(l_discount), max(l_discount),
        |  CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT),
        |  round(quantile_cont(l_discount, 0.5), 6)
        |FROM lineitem""".stripMargin,

    "dedup_simhash" -> simhashOracleSql,

    // semantics, not plan: every token above the frequency threshold,
    // exact counts — the engine's sketch+verify must land on exactly this
    "txt_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |n AS (SELECT count(*) AS n FROM tok)
        |SELECT tok, count(*) AS freq
        |FROM tok CROSS JOIN n
        |GROUP BY tok, n
        |HAVING count(*) * 256 > n""".stripMargin,

    "dedup_simhash_incr" ->
      s"""WITH sh AS ($simhashWideOracleSql),
         |b AS (SELECT doc_id AS batch_id, simhash AS bh FROM sh WHERE doc_id % 2 = 1),
         |c AS (SELECT doc_id AS dup_of, simhash AS ch FROM sh WHERE doc_id % 2 = 0),
         |m AS (
         |  SELECT batch_id, dup_of, CAST(bit_count(xor(bh, ch)) AS INT) AS hamming
         |  FROM b JOIN c ON bit_count(xor(bh, ch)) <= 3),
         |r AS (
         |  SELECT batch_id, dup_of, hamming,
         |    row_number() OVER (PARTITION BY batch_id ORDER BY hamming, dup_of) AS rn
         |  FROM m)
         |SELECT batch_id, dup_of, hamming FROM r WHERE rn = 1""".stripMargin,

    // the pair oracle states the SEMANTICS (all doc pairs within
    // hamming 3 of each other), not the banded plan: brute force is
    // fine at oracle scale, and pinning the definition rather than the
    // implementation is the point of an oracle
    "dedup_simhash_pairs" ->
      s"""WITH sh AS ($simhashWideOracleSql),
         |a AS (SELECT doc_id AS d1, simhash AS h1 FROM sh),
         |b AS (SELECT doc_id AS d2, simhash AS h2 FROM sh)
         |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
         |FROM a JOIN b ON d1 < d2
         |WHERE bit_count(xor(h1, h2)) <= 3""".stripMargin,

    "txt_bm25" -> {
      val terms = Seq("spark", "join", "data")
      val dfCols = terms.zipWithIndex.map { case (t, i) =>
        s"sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS df$i"
      }.mkString(",\n  ")
      val contribs = terms.zipWithIndex.map { case (t, i) =>
        val tf = s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)"
        // (1.2 + 1.0), not 2.2: the engine computes k1+1 from the same
        // two doubles, and 2.2 parses to a DIFFERENT double than their sum
        s"""ln(1.0 + (n_docs - df$i + 0.5) / (df$i + 0.5)) * ($tf * (1.2 + 1.0)) /
           |    ($tf + 1.2 * (1.0 - 0.75 + 0.75 * len(toks) * n_docs / total_len))""".stripMargin
      }.mkString("\n  + ")
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |st AS (
         |  SELECT count(*) AS n_docs, sum(len(toks)) AS total_len,
         |  $dfCols
         |  FROM d),
         |sc AS (
         |  SELECT doc_id, round(
         |  $contribs, 6) AS score
         |  FROM d CROSS JOIN st)
         |SELECT doc_id, score FROM sc WHERE score > 0
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
    }
  )

  /** The 60-bit SimHash fingerprint oracle (the [[simhashFrameWide]]
    * twin: full phash feature hashes, 60 bit-weight sums). */
  private lazy val simhashWideOracleSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, ${phashSql("tok")} AS h
       |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
       |        FROM documents)),
       |bits AS (
       |  SELECT doc_id, b,
       |    sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS w
       |  FROM tok CROSS JOIN (SELECT unnest(range(60)) AS b)
       |  GROUP BY doc_id, b)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
       |FROM bits GROUP BY doc_id""".stripMargin

  /** The 32-bit SimHash fingerprint oracle (dedup_simhash). */
  private lazy val simhashOracleSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, ${phashSql("tok")} % 4294967296 AS h
       |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
       |        FROM documents)),
       |bits AS (
       |  SELECT doc_id, b,
       |    sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS w
       |  FROM tok CROSS JOIN (SELECT unnest(range(32)) AS b)
       |  GROUP BY doc_id, b)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
       |FROM bits GROUP BY doc_id""".stripMargin
}
