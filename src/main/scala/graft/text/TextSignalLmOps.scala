package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Quality/repetition/entropy signals, n-gram LM scoring (unigram/bigram/Kneser-Ney), monitoring reports.
  *
  * Mixed into [[TextQueries]] (`this: TextQueries.type`): one of the
  * line-range-preserving module splits of the original single file —
  * zero behavior change, member order (and therefore val
  * initialization order) identical to the pre-split layout.
  */
private[text] trait TextSignalLmOps { this: TextQueries.type =>
  /** The quality-metric SQL bodies over a lambda-bound token array
    * `toks` (plus the raw `text` column), in output order — the ONE
    * definition [[qualityStats]] and [[qualityKeep]] both render from,
    * so an edit to a formula (and its DuckDB oracle mirror) can never
    * drift between the stats frame and the filter predicate. */
  private[text] val qualityMetricSqls: Seq[(String, String)] = Seq(
    "n_words" -> "size(toks)",
    // exact arithmetic: total chars minus the n-1 separators, as txt_stats
    "mean_word_len" ->
      "CAST(length(text) - (size(toks) - 1) AS DOUBLE) / size(toks)",
    "frac_distinct" ->
      "CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks)",
    "stop_distinct" ->
      s"size(filter(array(${STOP.map(s => s"'$s'").mkString(", ")}), sw -> array_contains(toks, sw)))")

  private[text] def keepSql(minWords: Int, minMeanLen: Double, maxMeanLen: Double,
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
  private[text] def dupFracSql(n: Int): String = {
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
  private[text] def unigramVocab(docs: DataFrame): DataFrame = docs
    .select(explode(split(col("text"), " ")).as("tok"))
    .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** Deterministic topV truncation (count desc, key asc) — ONE
    * definition of pruning determinism for every count table. */
  private[text] def truncTop(df: DataFrame, topV: Option[Int],
                       cnt: String, key: String): DataFrame =
    topV.fold(df)(v => df.orderBy(col(cnt).desc, col(key)).limit(v))

  private[text] def truncVocab(full: DataFrame, topV: Option[Int]): DataFrame =
    truncTop(full, topV, "cnt", "tok")

  /** (bigram, count) table — the ONE corpus-sized counting pass the
    * bigram-family scorers share ([[bigramScore]], [[kneserNeyScore]]). */
  private[text] def bigramCounts(docs: DataFrame): DataFrame = docs
    .select(split(col("text"), " ").as("toks"))
    .select(explode(expr(ngramArrayExpr(2))).as("bg"))
    .groupBy("bg").agg(count(lit(1)).as("bcnt"))

  def unigramScore(docs: DataFrame, topV: Option[Int] = None,
                   oovCount: Double = 0.5): DataFrame = {
    // MATERIALIZED: the truncated broadcast side and the normalizer
    // both derive from the vocabulary count — lazily each would re-run
    // the corpus explode+aggregate under its own branch (broadcast
    // branches defeat exchange reuse). Session-owned, vocab-bounded.
    val full = graft.ops.Scale.materializeCompact(unigramVocab(docs))
    // normalizer over the FULL corpus even when the broadcast side is
    // topV-truncated (OOV mass must still be "rare", not renormalized):
    // sum(cnt) over the full vocabulary IS the corpus token total, and
    // with `full` materialized it is a vocab-sized aggregate over the
    // checkpoint — zero extra corpus scans (the pre-materialization
    // form paid a separate per-row token-count scan instead, because
    // deriving it from the LAZY `full` would have re-shuffled the
    // corpus a third time).
    val tot = full.agg(sum(col("cnt")).cast("double").as("tot"))
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
    // MATERIALIZED: three consumers (the truncated broadcast side, the
    // biProb denominator join, the normalizer) would otherwise each
    // re-run the corpus unigram aggregate — broadcast branches defeat
    // exchange reuse (the kneserNeyScoreN lesson). Session-owned
    // storage, vocab-bounded rows.
    val uniFull = graft.ops.Scale.materializeCompact(docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("ucnt")))
    // normalizer over the FULL corpus even when the broadcast side is
    // topV-truncated (OOV mass must still be "rare", not renormalized):
    // sum(ucnt) over the full vocabulary IS the corpus token total —
    // with uniFull materialized this is a vocab-sized aggregate over
    // the checkpoint, zero corpus scans (the pre-materialization form
    // re-scanned the corpus for a per-row token-count sum).
    val tot = uniFull.agg(sum(col("ucnt")).cast("double").as("tot"))
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
    // the pure continuation probability below. MATERIALIZED so the
    // three derived model tables (lwTable, contR, types) aggregate the
    // checkpointed rows instead of each re-running the corpus counting
    // pass under its own broadcast (broadcast branches defeat exchange
    // reuse — the kneserNeyScoreN lesson); session-owned storage.
    val bc = graft.ops.Scale.materializeCompact(truncTop(bcFull, topV, "bcnt", "bg"))
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
    // MATERIALIZED, not just declared-shared: the 2(n-1) derived model
    // tables below each broadcast, and broadcast branches are not
    // exchange-reusable (canonicalization differs per consumer) — the
    // lazy form re-executed the corpus tokenize+explode+aggregate once
    // per table (measured: 11 parquet scans / 0 ReusedExchange at n=5,
    // a ~10x multiplier on the dominant cost at corpus scale). The
    // checkpoint pins the counting pass to exactly one execution; its
    // rows are the compact (gram, cnt) table — vocab-bounded under
    // `topV` — and it is session-owned (the block-manager storage lives
    // until the session's RDD sweep; BenchLarge's clearAfter releases
    // it, the TextMixOps session-owned-cache convention).
    val tc = graft.ops.Scale.materializeCompact(truncTop(tcFull, topV, "cnt", "g"))
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
    // the per-level probability terms, shared by both plan shapes below
    // (IDENTICAL expression trees — double arithmetic is not
    // reassociated by Catalyst, so the two shapes are bit-equal)
    val p1: Column = coalesce(col("t1").cast("double"), lit(0.5)) / col("tot_ty")
    def pMid(i: Int, below: Column): Column = coalesce(
      greatest(coalesce(col(s"t$i"), lit(0L)).cast("double") - discount, lit(0.0)) / col(s"den$i"),
      lit(0.0)) +
      coalesce(lit(discount) * col(s"ty$i") / col(s"den$i"), lit(1.0)) * below
    def pTop(below: Column): Column = coalesce(
      greatest(coalesce(col("cnt"), lit(0L)).cast("double") - discount, lit(0.0)) / col(s"den$n"),
      lit(0.0)) +
      coalesce(lit(discount) * col(s"ty$n") / col(s"den$n"), lit(1.0)) * below

    val pre = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(ngramArrayExpr(n))).as("g"))

    if (topV.isEmpty) {
      // UNPRUNED fast path (the registered sf-scale configuration):
      // every scored transition is, by construction, a retained gram
      // type — tc is the full inventory — so every model-table lookup
      // HITS, and the whole recursion can be precomputed ONCE PER GRAM
      // TYPE on the model side. The scoring pass then probes a single
      // broadcast (g → p) instead of 2(n−1)+2 of them. This is not
      // (mainly) a row-count win: fusing 10 broadcast probes + the
      // n-gram Generate into one whole-stage-codegen span generates a
      // method far past HotSpot's 8000-bytecode DontCompileHugeMethods
      // JIT ceiling — measured at n=5/sf0.1: 34-42 s per pass with
      // 131-164 s of aggregate JIT-thread time and 4-8 s GC, against
      // ~1 s of actual data work.
      //
      // Shape of the precompute, second iteration: each level's two
      // tables pre-join into ONE per-level lookup L_i (an independent
      // 1-probe span, so all levels' broadcast builds run in
      // PARALLEL), and the per-gram table joins them FLAT — one
      // (n+1)-probe span over the vocab-sized gram table, the same
      // probe count the n=3 scorer has always run fused over the
      // full corpus fan-out. The first iteration nested each level on
      // the build side of the one above, which kept spans small but
      // SERIALIZED ~n broadcast builds; under a JIT/GC-loud JVM each
      // sequential build pays elevated stage latency, which measured
      // as a 3.7-23.5 s spread across same-code full-suite runs.
      // The probability expression is the SAME nested tree evaluated
      // on the flat row (storing no intermediate changes no double),
      // so results stay bit-equal to the pruned path.
      //
      // Under topV the precompute is unsound (a pruned transition must
      // cascade through partial lookups), so the pruned path below
      // keeps the general join chain — which is also the bounded-state
      // shape web scale requires (model tables vocab-bounded; a g-keyed
      // table over the full inventory is not).
      var pg = sided
        .join(broadcast(ctxN), wc(1, n - 1), "left")
      for (i <- (n - 1) to 2 by -1)
        pg = pg.join(
          broadcast(bT(i).join(broadcast(midT(i)), wc(n - i + 1, n - 1), "left")),
          wc(n - i + 1, n), "left")
      var p: Column = p1
      for (i <- 2 until n) p = pMid(i, p)
      val pgP = pg
        .join(broadcast(bT(1)), Seq(s"w$n"), "left")
        .crossJoin(broadcast(totTy))
        .select(col("g"), pTop(p).as("_p"))
      pre
        .join(broadcast(pgP), Seq("g"), "left")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_transitions"),
          round(avg(-log(col("_p"))), 6).as(s"nll_kn$n"))
    } else {
      // PRUNED general path: a transition's gram (or any suffix level)
      // may be missing from the retained model — the recursion must
      // evaluate per transition row with lambda = 1 backoff at every
      // level whose context was pruned away, so each level's tables
      // join onto the fan-out individually.
      var p: Column = p1
      for (i <- 2 until n) p = pMid(i, p)
      p = pTop(p)
      var scored = pre
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
  }

  /** The [[kneserNeyScoreN]] DuckDB oracle, generated for any order —
    * CTE chain mirroring the derivation table for table, the nested
    * interpolation expression term for term (unpruned at oracle scale,
    * so the lambda-1 pruning arms are dead here; spec-pinned instead). */
  private[text] def knOracleSql(n: Int): String = {
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
    // MATERIALIZED: `totals` and `top` both consume the vocabulary —
    // lazily each re-runs the corpus aggregate (the kneserNeyScoreN
    // lesson). Session-owned, vocab-bounded rows.
    val vocab = graft.ops.Scale.materializeCompact(docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq")))
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
    // MATERIALIZED: each vocabulary feeds the full-outer join AND its
    // totals row — lazily each consumer re-runs the corpus aggregate
    // (6 scans where 2 suffice; the kneserNeyScoreN lesson).
    // Session-owned, vocab-bounded rows.
    val vo = graft.ops.Scale.materializeCompact(vocab(oldDocs))
    val vn = graft.ops.Scale.materializeCompact(vocab(newDocs))
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
  private[text] val charClasses = Seq(
    "letter" -> "[A-Za-z]", "digit" -> "[0-9]",
    "space" -> "[ \\t\\n\\r]", "punct" -> "[!-/:-@\\[-`{-~]")

  /** The ppm CASE formula shared by [[charClassProfile]] and
    * [[letterPpmExpr]] — ONE spelling of the zero-length sentinel and
    * the BIGINT-promoted `div`, so the two can never drift apart. */
  private[text] def ppmSql(cnt: String, len: String): String =
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
    // MATERIALIZED: both count lookups below consume the vocabulary —
    // lazily each re-runs the corpus aggregate (the kneserNeyScoreN
    // lesson). Session-owned, vocab-bounded rows.
    val vocab = graft.ops.Scale.materializeCompact(
      docs.select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")))
    // N (token instances) derives from the materialized vocabulary
    // (sum of counts — zero corpus scans); B (bigram instances) is
    // N − n_docs exactly, since every NON-NULL doc contributes
    // |toks| ≥ 1 tokens (split of an empty text is one empty-string
    // token) and therefore |toks| − 1 = max(|toks| − 1, 0) bigram
    // slots. The doc count must be count(text) — non-null, matching
    // the explode, which drops null-text docs from n_toks — or each
    // null doc would wrongly subtract 1 from B.
    val totals = vocab.agg(sum(col("c")).cast("long").as("n_toks"))
      .crossJoin(docs.agg(count(col("text")).as("n_docs")))
      .select(col("n_toks"), (col("n_toks") - col("n_docs")).as("n_bigrams"))
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
    // MATERIALIZED: the cumsum points and the totals row both consume
    // the per-doc series — lazily each would re-run BOTH corpus scans
    // (the kneserNeyScoreN lesson). Compact (doc_id, n_toks, new_types)
    // rows, one per document; session-owned storage.
    val series = graft.ops.Scale.materializeCompact(
      perDoc.join(firstDoc, Seq("doc_id"), "left")
        .na.fill(0L, Seq("new_types")))
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
    // totals from the materialized series (identical values: the left
    // join keeps every doc row and fills absent new_types with 0, and
    // every type has exactly one first document) — zero extra scans
    val totals = series.agg(sum(col("n_toks")).as("total_tokens"),
      sum(col("new_types")).as("vocab_size"))
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
}
