package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executed-scan-count regression gate — the audit the redundant-
  * counting-pass bug class needs (PlanSpec pins exchange SHAPES; it
  * cannot see scan COUNTS, which is how the KN-5 scorer shipped two
  * green rounds executing eleven parquet scans under a "corpus is
  * never re-scanned" scaladoc).
  *
  * Every `SparkEntry.queries` entry must appear in the expected map;
  * each is executed at sf0.001 and its
  * [[graft.ops.Scale.executedFileScans]] count (see that scaladoc for
  * the exact counting convention: AQE-final plan, ReusedExchange = 0,
  * one build per distinct cache, checkpoint leaves = 0) must equal the
  * declared value. A count that RISES flags a recompute regression; a
  * count that FALLS means an improvement landed — update the map
  * deliberately in the same commit either way. Regenerate with
  * `runMain graft.ScanAudit`.
  *
  * Reading the numbers: a count above 1 is NOT itself a defect — it
  * counts ALL file scans, including scans of DISTINCT tables (the
  * TPC-H joins: q5_nation_revenue = 5 one-per-table) and deliberate
  * multi-pass designs. The documented multi-pass families:
  *  - three-pass scrubs (txt_scrub_lines/_ngrams, dedup_substring,
  *    dedup_paragraph, corpus_tokenize = count + positional collect +
  *    rebuild): the optimizer's isnotnull on the build side defeats
  *    exchange reuse between the passes, each moves compact rows;
  *  - index + doc-side + probe dedup joins (dedup_jaccard_join 3,
  *    dedup_contain_join 4, dedup_lsh_pairs 4, *_incr): each input
  *    contributes its own scan by design, plus the verification join's
  *    re-derivation where the index is built in-query;
  *  - audit queries run BOTH chains by definition (lsh_recall 4,
  *    emb_ann_recall 5);
  *  - corpus_funnel 4 re-runs the survivor chain per stage by design
  *    (the stage-wise report IS repeated filtering);
  *  - zero-scan queries end in driver-built local/checkpoint leaves
  *    (trainer state, one-row profiles whose inputs were materialized
  *    at construction: txt_zipf, vocab_drift, txt_heaps).
  */
/** The shared gate: the 202-query expected map plus the shard runner.
  * Sharded because one monolithic test ran ~2.5 min and grows with
  * every query — four interleaved shards keep each suite under a
  * minute (VERDICT r12 #5) without changing a single pinned count.
  * Shards interleave by sorted index (i % 4), not by name range, so
  * the expensive dedup/txt families spread across shards. */
object ScanCountGate {
  val expected: Map[String, Int] = Map(
    "anti_join" -> 2,
    "asof_join" -> 2,
    "block_max_norm" -> 1,
    "bloom_dedup" -> 2,
    "bloom_forget" -> 3,
    "bpe_byte_encode" -> 1,
    "bpe_encode" -> 1,
    "bpe_pairs" -> 1,
    "bpe_train" -> 0,
    "cal_krc" -> 1,
    "cal_perspective" -> 1,
    "cal_tof2ev" -> 1,
    "cal_tof2evpoly" -> 1,
    "case_expr" -> 1,
    "classifier_eval" -> 2,
    "config_asof" -> 1,
    "corpus_clean" -> 3,
    "corpus_diff" -> 2,
    "corpus_funnel" -> 4,
    "corpus_mix" -> 1,
    "corpus_mix_temp" -> 1,
    "corpus_mix_tokens" -> 2,
    "corpus_percentiles" -> 0,
    "corpus_sample" -> 1,
    "corpus_sample_k" -> 1,
    "corpus_shuffle" -> 1,
    "corpus_split" -> 1,
    "corpus_tokenize" -> 3,
    "corpus_upsample" -> 1,
    "count_rate" -> 1,
    "cube_agg" -> 1,
    "data_profile" -> 1,
    "date_ops" -> 1,
    "dedup_cdc_pairs" -> 0,
    "dedup_components" -> 0,
    "dedup_contain_incr" -> 3,
    "dedup_contain_join" -> 4,
    "dedup_editdist_dfcap" -> 2,
    "dedup_editdist_incr" -> 2,
    "dedup_editdist_matches" -> 2,
    "dedup_editdist_pairs" -> 1,
    "dedup_exact" -> 1,
    // 4 = the lazy-persist build scans of lshMatchesAgainst's pinned
    // frames (corpus side x2: band pass + verification shingles; batch
    // side x2: same) — exactly the work the earlier checkpoint variant
    // ran at construction time. The cache builds ONCE (deduped by
    // cacheBuilder in executedFileScans); consumers read it for free.
    "dedup_incremental" -> 4,
    "dedup_jaccard_brute" -> 3,
    "dedup_jaccard_incr" -> 4,
    "dedup_jaccard_join" -> 3,
    "dedup_keep" -> 1,
    "dedup_keep_best" -> 2,
    "dedup_lsh_pairs" -> 4,
    "dedup_minhash_sig" -> 1,
    "dedup_paragraph" -> 3,
    "dedup_paragraph_incr" -> 3,
    "dedup_simhash" -> 1,
    "dedup_simhash_incr" -> 1,
    "dedup_simhash_pairs" -> 0,
    "dedup_stats" -> 0,
    "dedup_substring" -> 3,
    "dedup_substring_chars" -> 2,
    "dedup_substring_chars_incr" -> 2,
    "dedup_substring_chars_keep" -> 2,
    "dedup_substring_incr" -> 2,
    "dedup_substring_keep" -> 2,
    "dedup_winnow_incr" -> 0,
    "dedup_winnow_pairs" -> 0,
    "dfield_lookup" -> 1,
    "distinct_agg" -> 1,
    "dsir_topk" -> 1,
    "dsir_weights" -> 1,
    "ecorr_gaussian" -> 1,
    "ecorr_lorentzian" -> 1,
    "ecorr_spherical" -> 1,
    "edc_extract" -> 1,
    "elapsed_time" -> 1,
    "emb_ann_buckets" -> 1,
    "emb_ann_recall" -> 5,
    "emb_ann_topk" -> 2,
    "emb_cosine_topk" -> 2,
    "emb_d4" -> 1,
    "emb_decontaminate" -> 3,
    "emb_dedup_exact" -> 1,
    "emb_incremental" -> 2,
    "emb_ivf_assign" -> 1,
    "emb_ivf_topk" -> 2,
    "emb_ivf_topk_p2" -> 2,
    "emb_ivfpq_topk" -> 2,
    "emb_kmeans" -> 1,
    "emb_kmeans_inertia" -> 1,
    "emb_kmeans_pp" -> 1,
    "emb_knn_degree" -> 1,
    "emb_knn_join" -> 2,
    "emb_neardup_pairs" -> 2,
    "emb_norms" -> 1,
    "emb_pagerank" -> 3,
    "emb_pca" -> 1,
    "emb_prototypes" -> 1,
    "emb_rvq_assign" -> 1,
    "emb_semdedup" -> 1,
    "emb_semdedup_km" -> 1,
    "emb_semdedup_pca" -> 1,
    "emb_semdedup_rvq" -> 1,
    "emb_whiten" -> 1,
    "event_funnel" -> 1,
    "event_range" -> 1,
    "event_retention" -> 2,
    "fit_traces_gauss" -> 1,
    "grid_nn_filter" -> 2,
    "grouped_mean_min" -> 1,
    "hist_1d" -> 1,
    "hist_1d_jitter" -> 1,
    "hist_1d_jitter_hash" -> 1,
    "hist_2d" -> 1,
    "hist_2d_weighted" -> 1,
    "hist_3d" -> 1,
    "hist_3d_dense" -> 1,
    "hist_3d_dense_shard" -> 1,
    "hist_4d" -> 1,
    "hist_per_axis" -> 2,
    "hist_rebin" -> 1,
    "lens_mcp_position" -> 1,
    // 4 → 6 in r16: the audit's EXACT side now hashes shingles with the
    // production xxhash64 while the LSH side keeps the oracle-replayed
    // md5 phash (portableHashExact), so the two chains' shingle subtrees
    // no longer canonicalize equal and their scans stop reusing — a
    // DELIBERATE trade (the cheaper exact chain wins 2.3 s at sf0.1;
    // at corpus scale the audit passes persistLineage=true, which
    // collapses each chain's scans regardless)
    "lsh_recall" -> 6,
    "marker_multithresh" -> 1,
    "mm_frame_sample" -> 1,
    "multimodal_features" -> 1,
    "pivot_agg" -> 1,
    "q1_agg" -> 1,
    "q3_top_orders" -> 3,
    "q5_nation_revenue" -> 5,
    "quality_classifier" -> 1,
    "quality_outliers" -> 1,
    "range_filter" -> 1,
    "rollup_agg" -> 1,
    "scalar_string" -> 1,
    "scalar_subquery" -> 2,
    "semi_join" -> 2,
    "sessionize" -> 1,
    "set_ops" -> 4,
    "sketch_distinct" -> 1,
    "sketch_distinct_by" -> 1,
    "sketch_distinct_incr" -> 1,
    "sketch_freq" -> 2,
    "sketch_freq_incr" -> 2,
    "sketch_quantiles" -> 0,
    "sketch_quantiles_by" -> 0,
    "sliding_window" -> 1,
    "sort_regex" -> 1,
    "sort_topk" -> 1,
    "source_filter" -> 2,
    "source_stats" -> 1,
    "step_interpolate" -> 1,
    "stream_hist_batch" -> 1,
    "tok_fertility" -> 2,
    "tps_apply" -> 1,
    "txt_bigram_lm" -> 2,
    "txt_blocklist" -> 1,
    "txt_blocklist_redact" -> 1,
    "txt_blocklist_spans" -> 1,
    "txt_bm25" -> 2,
    "txt_bpeish" -> 1,
    "txt_c4_filter" -> 1,
    "txt_cdc" -> 1,
    "txt_charclass" -> 1,
    "txt_chunk" -> 1,
    "txt_compress" -> 1,
    "txt_contain_frac" -> 2,
    "txt_decontaminate" -> 3,
    "txt_dup_coverage" -> 2,
    "txt_entropy" -> 1,
    "txt_fingerprint" -> 1,
    "txt_heaps" -> 0,
    "txt_heavy_hitters" -> 1,
    "txt_kn_lm" -> 1,
    "txt_kn_lm_3" -> 1,
    "txt_kn_lm_5" -> 1,
    "txt_langid" -> 1,
    "txt_normalize" -> 1,
    "txt_pack" -> 1,
    "txt_pack_bfd" -> 1,
    "txt_pack_bfd_stats" -> 1,
    "txt_pii" -> 1,
    "txt_pii_cc" -> 1,
    "txt_pmi" -> 2,
    "txt_ppl_buckets" -> 0,
    "txt_quality" -> 1,
    "txt_readability" -> 1,
    "txt_repetition" -> 1,
    "txt_repetition_keep" -> 1,
    "txt_scrub_lines" -> 3,
    "txt_scrub_ngrams" -> 3,
    "txt_signals" -> 1,
    "txt_stats" -> 1,
    "txt_tfidf" -> 1,
    "txt_top_ngram" -> 1,
    "txt_unigram_lm" -> 1,
    "txt_vocab_topk" -> 1,
    "txt_winnow" -> 1,
    "txt_zipf" -> 0,
    "unigram_encode" -> 2,
    "unigram_train" -> 0,
    "union_all_rows" -> 2,
    "vocab_drift" -> 0,
    "window_running" -> 1,
    "window_topn" -> 1,
    "wordpiece_encode" -> 2,
    "wordpiece_train" -> 0
  )

  /** Execute shard `shard` of `of` and return the mismatch lines. */
  def runShard(shard: Int, of: Int): Seq[String] = {
    import SparkTestSession._
    SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex
      .filter { case (_, i) => i % of == shard }
      .flatMap { case ((name, fn), _) =>
        // a catalog cache left by an earlier query (or suite) would
        // substitute into this plan and change its count
        spark.catalog.clearCache()
        val got = graft.ops.Scale.executedFileScans(fn(spark, sfDir))
        if (got == expected(name)) None
        else Some(s"$name: expected ${expected(name)}, executed $got")
      }
  }
}

class ScanCountSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every registered query declares an expected executed-scan count") {
    val missing = SparkEntry.queries.keySet.diff(ScanCountGate.expected.keySet)
    val stale = ScanCountGate.expected.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty,
      s"queries without a declared scan count (add to ScanCountGate): ${missing.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"scan-count entries for queries that no longer exist: ${stale.toSeq.sorted.mkString(", ")}")
  }
}

class ScanCountShard0Spec extends AnyFunSuite {
  test("executed file-scan count matches the declared map (shard 0/4)") {
    val mismatches = ScanCountGate.runShard(0, 4)
    assert(mismatches.isEmpty, s"scan-count regressions:\n${mismatches.mkString("\n")}")
  }
}

class ScanCountShard1Spec extends AnyFunSuite {
  test("executed file-scan count matches the declared map (shard 1/4)") {
    val mismatches = ScanCountGate.runShard(1, 4)
    assert(mismatches.isEmpty, s"scan-count regressions:\n${mismatches.mkString("\n")}")
  }
}

class ScanCountShard2Spec extends AnyFunSuite {
  test("executed file-scan count matches the declared map (shard 2/4)") {
    val mismatches = ScanCountGate.runShard(2, 4)
    assert(mismatches.isEmpty, s"scan-count regressions:\n${mismatches.mkString("\n")}")
  }
}

class ScanCountShard3Spec extends AnyFunSuite {
  test("executed file-scan count matches the declared map (shard 3/4)") {
    val mismatches = ScanCountGate.runShard(3, 4)
    assert(mismatches.isEmpty, s"scan-count regressions:\n${mismatches.mkString("\n")}")
  }
}
