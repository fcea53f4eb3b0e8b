package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sequence packing, corpus mixing, and the composed clean/funnel/tokenize pipelines.
  *
  * Mixed into [[TextQueries]] (`this: TextQueries.type`): one of the
  * line-range-preserving module splits of the original single file —
  * zero behavior change, member order (and therefore val
  * initialization order) identical to the pre-split layout.
  */
private[text] trait TextMixOps { this: TextQueries.type =>
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
  private[text] def tempMixOracles: Map[String, String] = cachedTempBudgets match {
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
  private[text] def tokenMixOracles: Map[String, String] = cachedTokenBudgets match {
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
    // the cleaned corpus feeds BOTH the trainer's counting pass and the
    // encode pass — cache it once; session-owned (released by
    // clearCache/session end), the lshPairs lineage-cache convention
    val cleaned = corpusClean(corpus, benchmark, n, threshold,
      persistLineage = persistLineage, keepText = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = bpeTrain(cleaned, numMerges)
    cachedTokenizeMerges = Some(merges)
    packCounts(
      bpeEncode(cleaned, merges).select(col("doc_id"), col("n_tokens")),
      budget)
  }
}
