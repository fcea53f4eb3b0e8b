package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Byte-level BPE: the GPT-2 tokenizer shape (Radford et al. 2019,
  * "Language Models are Unsupervised Multitask Learners" §2.2) —
  * pretokenize with the GPT-2 regex, fall back to BYTES so no input is
  * ever out-of-vocabulary, then learn/apply BPE merges over the byte
  * alphabet. This is the form GPT-family production pipelines actually
  * ship; the char-level [[TextQueries.bpeTrain]] family is the Sennrich
  * original.
  *
  * Two representation choices keep every step a portable Catalyst /
  * DuckDB expression (no UDF on either side):
  *
  *  - **Pretokenizer** = [[TextQueries.BpeishPattern]]: the GPT-2
  *    alternation with the `\s+(?!\S)` lookahead dropped, so the SAME
  *    pattern runs identically under Java regex (Spark) and RE2
  *    (DuckDB) — the regex-portability discipline the reference's own
  *    tokenization surface follows (cf. mpes fprocessing.py:232-269).
  *  - **Byte symbols** = uppercase hex pairs (`"48"`, `"65"`, merged
  *    `"4865"`), derived as `hex(encode(pretok, 'UTF-8'))` in BOTH
  *    engines. GPT-2's bytes_to_unicode table is just a printability
  *    bijection — merge behavior depends only on byte identity, so hex
  *    is semantically identical and cross-engine exact. Byte fallback
  *    is inherent: every possible input byte has a symbol, so encode
  *    coverage is total by construction (spec-pinned on CJK / emoji /
  *    raw-byte fixtures).
  *
  * Scale (100 TB): identical shape to [[TextQueries.bpeTrain]] /
  * [[TextQueries.bpeEncode]] — the corpus contributes exactly ONE pass
  * (the pretoken-frequency aggregate, map-side combined); training and
  * vocabulary encode run on the DISTINCT-pretoken table (Heaps-law
  * bounded), driver-heap loop with zero Spark jobs per merge under the
  * vocab bound, distributed per-round fallback above it; the encoded
  * vocabulary BROADCASTS onto the doc_id-clustered pretoken fan-out, so
  * the corpus-sized stage never shuffles on the skewed pretoken key.
  */
object ByteBpe {

  /** UTF-8 hex byte symbols of a pretoken — the driver-side initial
    * alphabet ("He" → Vector("48", "65")). */
  private[graft] def hexSyms(w: String): Vector[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X").toVector

  /** Distributed twin of [[hexSyms]] over a `word` column (requires
    * non-empty words: sequence(1, 0) counts down — the
    * [[TextQueries.bpeTrainDistributed]] slice caveat). */
  private[graft] val hexSymsExpr: Column = expr(
    """transform(sequence(1, octet_length(word)),
      |  i -> substring(hex(encode(word, 'UTF-8')), 2 * i - 1, 2))""".stripMargin)

  /** (word, freq) pretoken-frequency table — the ONLY corpus-sized pass
    * in the byte-BPE pipeline. Pretokens come from the portable GPT-2
    * pattern, so they carry their leading space (GPT-2 style: the space
    * belongs to the token, there is no `</w>` marker). */
  private def pretokFreq(docs: DataFrame): DataFrame =
    docs.select(explode(regexp_extract_all(col("text"),
        lit(TextQueries.BpeishPattern), lit(0))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` byte-level merges: [[TextQueries.bpeTrainDriver]]
    * with the hex-byte alphabet under the driver bound, the distributed
    * per-round loop above it — both alphabet-parametrized, both
    * producing identical tables (parity spec-pinned). */
  def train(docs: DataFrame, numMerges: Int = 30,
            maxDriverVocab: Long = 4000000L): Seq[(Int, String, String)] = {
    val vocab = pretokFreq(docs).localCheckpoint()
    if (vocab.count() <= maxDriverVocab)
      TextQueries.bpeTrainDriver(
        vocab.collect().map(r => (r.getString(0), r.getLong(1))), numMerges,
        initSyms = hexSyms)
    else TextQueries.bpeTrainDistributed(vocab, numMerges, initSyms = hexSymsExpr)
  }

  /** Apply a learned byte-level merge table: per-document
    * (n_pretoks, n_bytes, n_tokens, stream_hash) where stream_hash is
    * the md5 of the space-joined merged-symbol stream in pretoken order
    * — the cross-engine encode-parity pin. n_bytes (UTF-8 octets across
    * pretokens) upper-bounds n_tokens; equality means no merge applied.
    *
    * Scale: merges apply to the DISTINCT-pretoken vocabulary, which
    * broadcasts back onto the corpus's doc_id-clustered pretoken
    * fan-out ([[TextQueries.bpeEncode]]'s audited plan). */
  def encode(docs: DataFrame, merges: Seq[(Int, String, String)],
             maxDriverVocab: Long = 4000000L): DataFrame = {
    val spark = docs.sparkSession
    val vocab = pretokFreq(docs).select(col("word")).localCheckpoint()
    val encoded =
      if (vocab.count() <= maxDriverVocab) {
        val ranks = merges.map { case (rk, l, r) => (l, r) -> rk }.toMap
        val rows = vocab.collect().map { row =>
          val w = row.getString(0)
          org.apache.spark.sql.Row(w,
            TextQueries.encodeWordDriver(w, ranks, initSyms = hexSyms))
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
        val init = vocab.withColumn("syms", hexSymsExpr)
        merges.sortBy(_._1).foldLeft(init) { case (df, (_, l, r)) =>
          df.withColumn("syms", TextQueries.mergePairExpr(l, r)).localCheckpoint()
        }
      }
    docs.repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(regexp_extract_all(col("text"),
        lit(TextQueries.BpeishPattern), lit(0))).as(Seq("pos", "word")))
      .join(broadcast(encoded), Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_pretoks"),
        sum(octet_length(col("word")).cast("long")).as("n_bytes"),
        sum(size(col("syms"))).as("n_tokens"),
        md5(concat_ws(" ", flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("syms")))),
          s => s.getField("syms"))))).as("stream_hash"))
  }

  /** Merge table learned by the bpe_byte_encode query, cached so the
    * oracle can embed the merges as literals (the
    * [[TextQueries.cachedMerges]] pattern). */
  @volatile private[text] var cachedMerges: Option[Seq[(Int, String, String)]] = None

  /** DuckDB twin of [[encode]] over `src`: pretokenize with the same
    * RE2-portable pattern, hex-byte the pretokens, fold the merges with
    * the DOUBLED-delimiter replace (the [[TextQueries]] bpe_encode
    * oracle's trick: ` l  r ` → ` lr ` consumes one flanking space per
    * side and restores it, so adjacent occurrences all merge exactly
    * like the engine's left-to-right scan). Hex symbols need no quote
    * escaping; all integer sums cast to BIGINT (DuckDB HUGEINT
    * widening hash-mismatches the driver's type-sensitive gate). */
  def encodeSqlFor(merges: Seq[(Int, String, String)],
                   src: String = "documents"): String = {
    val pat = TextQueries.BpeishPattern.replace("'", "''")
    val applied = merges.sortBy(_._1)
      .foldLeft("concat('  ', regexp_replace(hex(encode(word)), '([0-9A-F]{2})', '\\1  ', 'g'))") {
        case (acc, (_, l, r)) => s"replace($acc, ' $l  $r ', ' ${l + r} ')"
      }
    s"""WITH w AS (
       |  SELECT doc_id, i AS pos, toks[i] AS word
       |  FROM (SELECT doc_id, regexp_extract_all(text, '$pat') AS toks FROM $src tsrc),
       |       LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i)),
       |enc AS (SELECT word, trim(replace($applied, '  ', ' ')) AS encoded
       |        FROM (SELECT DISTINCT word FROM w) v WHERE length(word) >= 1)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_pretoks,
       |  CAST(sum(octet_length(encode(word))) AS BIGINT) AS n_bytes,
       |  CAST(sum(len(string_split(encoded, ' '))) AS BIGINT) AS n_tokens,
       |  md5(string_agg(encoded, ' ' ORDER BY pos)) AS stream_hash
       |FROM w JOIN enc USING (word)
       |GROUP BY doc_id""".stripMargin
  }

  /** bpe_byte_encode: train 30 byte-level merges on the corpus, encode
    * it — the GPT-2 tokenizer loop end to end, oracle-verified. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_byte_encode" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val merges = train(docs, numMerges = 30)
      cachedMerges = Some(merges)
      encode(docs, merges)
    })

  def oracles: Map[String, String] = cachedMerges match {
    case None         => Map.empty
    case Some(merges) => Map("bpe_byte_encode" -> encodeSqlFor(merges))
  }
}
