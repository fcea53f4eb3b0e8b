package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextQueries

/** Mergeable sketch indexes — bounded-size summaries that persist as
  * per-shard tables, union across corpus snapshots, and finalize
  * without re-scanning history. They serve the monitoring family
  * (`vocab_drift`, `corpus_percentiles`) incrementally: today those
  * queries re-scan both snapshots end to end; with a sketch table per
  * ingest shard, a new snapshot costs one pass over the NEW shard plus
  * a merge over ≤sketch-sized rows.
  *
  * Two sketches, both chosen for cross-engine DETERMINISM (the oracle
  * replays the whole computation in DuckDB, so randomized compaction
  * is off the table):
  *
  *  - **Distinct sketch** = classic HyperLogLog (Flajolet, Fusy,
  *    Gandouet, Meunier 2007) over the portable 60-bit md5 hash, m =
  *    4096 registers, with the small-range linear-counting correction.
  *    Registers are a pure (bucket → max rank) aggregate, so sketch
  *    build is one map-side-combined pass, merge is `max` per bucket —
  *    associative, idempotent, ORDER-FREE — and every arithmetic step
  *    until the final division is exact integers (rank via bit-length
  *    comparisons, the 2^-reg sum as scaled DECIMAL(38,0)).
  *  - **Quantile sketch** = fixed-resolution mergeable histogram:
  *    (signal, bucket, cnt) rows where the bucket is an EXACT integer
  *    function of the row (token count directly; mean word length as
  *    (1000·chars) div tokens — no float ever touches the key). Merge
  *    is `sum` per bucket. This plays the KLL role (Karnin, Lang,
  *    Liberty 2016) at the same bounded size, trading KLL's
  *    universe-independence (its compactors are randomized — not
  *    oracle-replayable) for a value-range bound that text-signal
  *    ranges easily satisfy; quantiles finalize at grid resolution.
  *
  * Scale (100 TB): each ingest shard writes its own ≤4096-row register
  * table / ≤range-sized histogram; corpus-wide distinct counts and
  * percentile dashboards then read ONLY sketch tables — the re-scan of
  * every historical shard that `vocab_drift`-style exact recomputation
  * pays is gone, and the merge is a few-KB shuffle regardless of
  * corpus size.
  */
object Sketches {
  type Q = (SparkSession, String) => DataFrame

  /** HLL geometry: m = 2^12 registers; the 60-bit portable hash leaves
    * 48 bits of rank material (rank ∈ 1..49). */
  val M = 4096
  private val RankBits = 48
  /** alpha_m · m² · 2^62 — the numerator of the raw HLL estimate with
    * the register sum pre-scaled by 2^62 to keep it integral. One
    * Scala double, embedded in both engines' SQL via shortest
    * round-trip, so the final division is bit-identical. */
  private val AlphaNum: Double =
    0.7213 / (1.0 + 1.079 / M) * M.toDouble * M.toDouble * 4.611686018427387904e18

  /** The (bucket, rank) pair of the 60-bit hash column `h` — bucket =
    * low 12 bits, rank = leading-zero count of the remaining 48 bits
    * + 1, computed by integer bit-length comparisons (no float log, so
    * both engines agree bit for bit). The bit length is a FLAT SUM of
    * 48 integer comparisons, not a `filter(sequence(...))`: the array
    * spelling allocated two 48-element arrays PER ELEMENT (~150M
    * transient arrays per 2M-doc scan), which made the distinct sketch
    * the suite's GC canary — late in a long session on a busy host it
    * measured 19× its isolated time purely from allocation pressure
    * (NOTES_r11 §10); the comparison chain is value-identical
    * (rank = 49 − |{b : 2^b ≤ x}|), allocation-free, and stays inside
    * whole-stage codegen. */
  private[graft] def hllBucketOf(h: String): Column =
    expr(s"CAST(($h) % $M AS INT)")
  private[graft] def hllRankOf(h: String): Column = {
    val x = s"(($h) div $M)"
    val bitLen = (0 until RankBits)
      .map(b => s"(CASE WHEN $x >= ${1L << b} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    expr(s"CAST(${RankBits + 1} - ($bitLen) AS INT)")
  }

  /** (bucket, reg) HLL register table of a value column — the
    * persistable sketch. One corpus pass, map-side combined down to
    * ≤ m rows per partition. */
  def hllRegisters(df: DataFrame, value: Column): DataFrame =
    df.select(TextQueries.phash(value).as("h"))
      .select(hllBucketOf("h").as("bucket"), hllRankOf("h").as("rank"))
      .groupBy("bucket").agg(max("rank").as("reg"))

  /** Per-shard register tables: (shard, bucket, reg) — write this
    * partitioned by `shard` and each ingest batch appends its own
    * shard's rows without touching history. */
  def hllShards(df: DataFrame, value: Column, shard: Column): DataFrame =
    df.select(shard.as("shard"), TextQueries.phash(value).as("h"))
      .select(col("shard"), hllBucketOf("h").as("bucket"), hllRankOf("h").as("rank"))
      .groupBy("shard", "bucket").agg(max("rank").as("reg"))

  /** Per-GROUP register tables: (grp, bucket, reg) — the grouped form
    * (distinct-per-source dashboards). Identical math, one extra key. */
  def hllRegistersBy(df: DataFrame, value: Column, group: Column): DataFrame =
    df.select(group.as("grp"), TextQueries.phash(value).as("h"))
      .select(col("grp"), hllBucketOf("h").as("bucket"), hllRankOf("h").as("rank"))
      .groupBy("grp", "bucket").agg(max("rank").as("reg"))

  /** A register table collapsed to ONE broadcastable row holding the
    * bucket→reg map — the model-row shape the streaming gates fold
    * static state through ([[graft.streaming.StreamOps]]): ≤ m entries
    * regardless of corpus size. */
  def hllRegisterMapRow(regs: DataFrame): DataFrame =
    regs.agg(map_from_entries(collect_list(struct(col("bucket"), col("reg"))))
      .as("regmap"))

  /** Union any number of register tables into one: max per bucket —
    * associative and idempotent, so shards/snapshots merge in any
    * order and re-merging is harmless. */
  def hllMerge(regTables: Seq[DataFrame]): DataFrame =
    regTables.map(_.select("bucket", "reg")).reduce(_ unionAll _)
      .groupBy("bucket").agg(max("reg").as("reg"))

  /** One-row estimate from a register table:
    * (n_hit, n_zero, est_e6) — registers hit, empty registers, and the
    * distinct estimate in exact micro-units. Raw estimate
    * alpha·m²/Σ2^-reg with the 2007 paper's small-range correction
    * (linear counting m·ln(m/V) when the raw estimate ≤ 2.5m and empty
    * registers remain). The register sum is the scaled integer
    * Σ 2^(62-reg) (+ 2^62 per empty register) in DECIMAL(38,0), so
    * both engines divide the same exact operands. */
  def hllFinalize(regs: DataFrame): DataFrame =
    finalizeAgged(regs.agg(hitAgg, sumAgg), Nil)

  /** Per-group [[hllFinalize]] over a (grp, bucket, reg) table:
    * (grp, n_hit, n_zero, est_e6), one row per group. */
  def hllFinalizeBy(regs: DataFrame): DataFrame =
    finalizeAgged(regs.groupBy("grp").agg(hitAgg, sumAgg), Seq(col("grp")))

  private def hitAgg: Column = count(lit(1)).as("n_hit")
  private def sumAgg: Column =
    coalesce(sum(expr("CAST(shiftleft(1L, 62 - reg) AS DECIMAL(38,0))")),
      lit(0).cast("decimal(38,0)")).as("s_hit")

  /** The shared estimate tail over an aggregated (…, n_hit, s_hit)
    * frame — ONE spelling of the raw/linear-counting formula for the
    * global, grouped, and streaming-overlay paths. */
  private def finalizeAgged(agged: DataFrame, keep: Seq[Column]): DataFrame =
    agged
      .select(keep ++ Seq(col("n_hit"), (lit(M.toLong) - col("n_hit")).as("n_zero"),
        (lit(AlphaNum) /
          (col("s_hit") + (lit(M.toLong) - col("n_hit")).cast("decimal(38,0)") *
            lit(4611686018427387904L).cast("decimal(38,0)")).cast("double"))
          .as("raw")): _*)
      .select(keep ++ Seq(col("n_hit"), col("n_zero"),
        expr(s"""CAST(round(CASE WHEN n_zero > 0 AND raw <= ${2.5 * M}
                |  THEN $M.0 * ln($M.0 / n_zero) ELSE raw END * 1e6) AS BIGINT)"""
          .stripMargin).as("est_e6")): _*)

  /** Per-shard mergeable histogram: (shard, signal, bucket, cnt) over
    * the two signals the percentile dashboard tracks, as EXACT integer
    * histogram keys: token count as itself; mean word length at 1e-3
    * resolution via (1000 · total-word-chars) div tokens (total word
    * chars = length − spaces = length − tokens + 1 — no float ever
    * touches the key). */
  def histShards(docs: DataFrame, shard: Column): DataFrame = {
    val withSig = docs
      .select(shard.as("shard"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("nt"),
        expr("CAST(length(text) AS BIGINT)").as("nc"))
      .select(col("shard"), col("nt"),
        expr("(1000 * (nc - nt + 1)) div nt").as("mwl"))
    withSig.select(col("shard"), lit("n_tokens").as("signal"), col("nt").as("bucket"))
      .unionAll(withSig.select(col("shard"), lit("mean_word_len").as("signal"),
        col("mwl").as("bucket")))
      .groupBy("shard", "signal", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Union histogram shards: sum per (signal, bucket). */
  def histMerge(shards: Seq[DataFrame]): DataFrame =
    shards.map(_.select("signal", "bucket", "cnt")).reduce(_ unionAll _)
      .groupBy("signal", "bucket").agg(sum("cnt").as("cnt"))

  /** Finalize grid quantiles from a merged histogram: for each signal
    * and percentile, the lower order statistic — the minimum bucket
    * whose cumulative count reaches rank = (q·(n−1)) div 100 + 1 —
    * decoded back to a value (bucket/1000 for the 1e-3-gridded
    * signal). The sketch is range-bounded, so it collects to the
    * driver (the exactQuantileGrid bounded-collect discipline) and the
    * scan that built it never re-runs. */
  def histQuantiles(merged: DataFrame, qPcts: Seq[Int] = Seq(5, 25, 50, 75, 95))
      : DataFrame = {
    val spark = merged.sparkSession
    import spark.implicits._
    val rows = merged.select("signal", "bucket", "cnt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = rows.groupBy(_._1).toSeq.flatMap { case (signal, rs) =>
      val sorted = rs.sortBy(_._2)
      val n = sorted.map(_._3).sum
      qPcts.map { q =>
        val rank = q.toLong * (n - 1) / 100L + 1L
        var cum = 0L
        val bucket = sorted.find { case (_, _, c) => cum += c; cum >= rank }
          .map(_._2).getOrElse(sorted.last._2)
        val value =
          if (signal == "mean_word_len") bucket.toDouble / 1000.0
          else bucket.toDouble
        (signal, q, value)
      }
    }.sortBy(x => (x._1, x._2))
    out.toDF("signal", "q_pct", "value")
  }

  /** Grouped finalize: per-(group, signal) grid quantiles from a
    * (shard, signal, bucket, cnt) frame whose shard column IS the
    * dashboard group (per-source monitoring: build with
    * `histShards(docs, col("source"))`; shards within a group still
    * sum-merge by the same (grp, signal, bucket) key). Same
    * bounded-collect discipline as [[histQuantiles]] — the frame is
    * range-bounded per group by construction. Output: (grp, signal,
    * q_pct, value). */
  def histQuantilesBy(byGrp: DataFrame, qPcts: Seq[Int] = Seq(5, 25, 50, 75, 95))
      : DataFrame = {
    val spark = byGrp.sparkSession
    import spark.implicits._
    val rows = byGrp
      .select(col("shard").cast("string"), col("signal"), col("bucket"), col("cnt"))
      .groupBy("shard", "signal", "bucket").agg(sum("cnt").cast("long").as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val out = rows.groupBy(r => (r._1, r._2)).toSeq.flatMap { case ((grp, signal), rs) =>
      val sorted = rs.sortBy(_._3)
      val n = sorted.map(_._4).sum
      qPcts.map { q =>
        val rank = q.toLong * (n - 1) / 100L + 1L
        var cum = 0L
        val bucket = sorted.find { case (_, _, _, c) => cum += c; cum >= rank }
          .map(_._3).getOrElse(sorted.last._3)
        val value =
          if (signal == "mean_word_len") bucket.toDouble / 1000.0
          else bucket.toDouble
        (grp, signal, q, value)
      }
    }.sortBy(x => (x._1, x._2, x._3))
    out.toDF("grp", "signal", "q_pct", "value")
  }

  // ---------------------------------------------------------------------------
  // Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
  // third sketch family member: a point-queryable FREQUENCY index.
  // d=4 hash rows × w=2048 counter columns; cell (r, h_r(x)) counts
  // every occurrence whose salted portable hash lands there; the
  // estimate for x is min over rows of its cell — always ≥ the true
  // count (one-sided error), within N/w of it in expectation per row.
  // Counters are a plain (row, col, cnt) COUNT aggregate → persistable
  // per shard; merge = SUM per cell — associative and commutative but
  // NOT idempotent (unlike the HLL max-merge, re-merging a shard
  // double-counts — shards must partition the corpus; spec-pinned).
  // Deterministic end to end (salted md5 hash, integer counts), so the
  // DuckDB oracle replays the whole computation.
  // ---------------------------------------------------------------------------

  /** CountMin geometry: d rows × w columns = 8192 cells ≈ 64 KB — the
    * broadcastable / driver-collectable sketch size class. */
  val CmD = 4
  val CmW = 2048

  /** The column index of value `v` in hash row `row`: the portable
    * 60-bit hash of "row:value" mod w — salt INSIDE the hash so the d
    * rows are independent functions of the same value. */
  private[graft] def cmColOf(row: Column, v: Column): Column =
    pmod(TextQueries.phash(concat(row.cast("string"), lit(":"), v)), lit(CmW))
      .cast("int")

  /** (row, col, cnt) CountMin counter table of a value column — the
    * persistable sketch. The d-way fan-out is partition-local (explode
    * + map-side combine collapses it to ≤ d·w rows per partition);
    * what shuffles is the ≤8192-group count aggregate. */
  def cmCounters(df: DataFrame, value: Column): DataFrame =
    df.select(value.as("v"))
      .select(explode(expr(s"sequence(0, ${CmD - 1})")).as("row"), col("v"))
      .select(col("row"), cmColOf(col("row"), col("v")).as("col"))
      .groupBy("row", "col").agg(count(lit(1)).as("cnt"))

  /** Union counter tables: SUM per cell. Exact when (and only when)
    * the inputs count DISJOINT slices of the corpus — the additive
    * merge contract (pinned: disjoint-shard merge == one-shot;
    * re-merging a shard is NOT harmless, unlike [[hllMerge]]). */
  def cmMerge(tables: Seq[DataFrame]): DataFrame =
    tables.map(_.select("row", "col", "cnt")).reduce(_ unionAll _)
      .groupBy("row", "col").agg(sum("cnt").cast("long").as("cnt"))

  /** Point-query a counter table: for each probe value, min over the d
    * rows of its cell count (0 if a cell is empty — the probe never
    * occurred). Probes fan out ×d, join the ≤8192-row counter table
    * (broadcast by size), and take the min — never a corpus scan. */
  def cmEstimate(counters: DataFrame, probes: DataFrame, value: Column): DataFrame =
    probes.select(value.as("v"))
      .select(col("v"), explode(expr(s"sequence(0, ${CmD - 1})")).as("row"))
      .select(col("v"), col("row"), cmColOf(col("row"), col("v")).as("col"))
      .join(broadcast(counters), Seq("row", "col"), "left")
      .groupBy("v").agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))

  /** The snapshot word streams shared with vocab_drift's fixture:
    * old = ids not ending in 9; new = ids not ending in 4 with ids
    * ending in 3 rewritten ([[TextQueries.snapshotSplit]] — the oracle
    * hardcodes the same split). */
  private def words(d: DataFrame): DataFrame =
    d.select(explode(split(col("text"), " ")).as("w"))

  def queries: Map[String, Q] = Map(
    // whole-corpus distinct-word estimate — sketch build + finalize
    "sketch_distinct" -> { (s, dir) =>
      hllFinalize(hllRegisters(words(Tables.documents(s, dir)), col("w")))
    },
    // incremental: the old snapshot's registers stand in for the
    // persisted index (materialized — the new snapshot must NOT
    // trigger an old-corpus re-scan), merged with the new shard's
    "sketch_distinct_incr" -> { (s, dir) =>
      val (old, neu) = TextQueries.snapshotSplit(Tables.documents(s, dir))
      val oldIdx = Scale.materializeCompact(hllRegisters(words(old), col("w")))
      hllFinalize(hllMerge(Seq(oldIdx, hllRegisters(words(neu), col("w")))))
    },
    // percentile dashboard from per-shard histograms (shard = doc_id%4)
    "sketch_quantiles" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val shards = histShards(docs, pmod(col("doc_id"), lit(4)))
      histQuantiles(histMerge(Seq(shards)))
    },
    // per-source distinct-vocabulary estimates — the grouped sketch
    "sketch_distinct_by" -> { (s, dir) =>
      val words = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
      hllFinalizeBy(hllRegistersBy(words, col("w"), col("source")))
        .withColumnRenamed("grp", "source")
    },
    // per-source quantile dashboard — the grouped member of the
    // histogram sketch (one histShards generator serves both: the
    // shard column IS the group)
    "sketch_quantiles_by" -> { (s, dir) =>
      histQuantilesBy(histShards(Tables.documents(s, dir), col("source")))
        .withColumnRenamed("grp", "source")
    },
    // CountMin frequency estimates for the corpus's top-20 words —
    // build + point-query; est_cnt >= exact_cnt always (one-sided)
    "sketch_freq" -> { (s, dir) =>
      val ws = words(Tables.documents(s, dir))
      val exact = ws.groupBy(col("w")).agg(count(lit(1)).as("exact_cnt"))
      val probes = exact.orderBy(col("exact_cnt").desc, col("w").asc).limit(20)
      probes.join(
          cmEstimate(cmCounters(ws, col("w")), probes, col("w"))
            .withColumnRenamed("v", "w"),
          Seq("w"))
        .select(col("w"), col("exact_cnt"), col("est_cnt"))
    },
    // incremental: the even-doc corpus contributes only its counter
    // table (materialized — additive merge REQUIRES a disjoint split,
    // unlike the idempotent HLL overlap-tolerant one); probes are the
    // new shard's own top-20, estimates come from the merged sketch
    "sketch_freq_incr" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val old = docs.filter(col("doc_id") % 2 === 0)
      val neu = docs.filter(col("doc_id") % 2 === 1)
      val oldIdx = Scale.materializeCompact(cmCounters(words(old), col("w")))
      val merged = cmMerge(Seq(oldIdx, cmCounters(words(neu), col("w"))))
      val probes = words(neu).groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(20).select("w")
      cmEstimate(merged, probes, col("w")).withColumnRenamed("v", "w")
    })

  /** DuckDB twins — each a FULL recompute from the raw table (the
    * incremental plan and the exact replay must agree register for
    * register / bucket for bucket, or mergeability is broken). */
  def oracles: Map[String, String] = {
    /** `grp` = a grouping-column name present in wordsSql's output, or
      * None for the global sketch. One SQL body for both shapes. */
    def hllSql(wordsSql: String, grp: Option[String] = None): String = {
      val g = grp.map(_ + ", ").getOrElse("")
      val gby = grp.map(" GROUP BY " + _).getOrElse("")
      val gout = grp.map(_ + ", ").getOrElse("")
      s"""WITH words AS ($wordsSql),
         |h AS (SELECT $g${TextQueries.phashSql("w")} AS h FROM words),
         |br AS (SELECT $g h % $M AS bucket,
         |         ${RankBits + 1} - len(list_filter(range(0, $RankBits),
         |           b -> (CAST(1 AS BIGINT) << b) <= (h // $M))) AS rank
         |       FROM h),
         |regs AS (SELECT $g bucket, max(rank) AS reg FROM br GROUP BY ${g}bucket),
         |agg AS (SELECT $g CAST(count(*) AS BIGINT) AS n_hit,
         |          CAST($M - count(*) AS BIGINT) AS n_zero,
         |          coalesce(sum(CAST((CAST(1 AS BIGINT) << (62 - reg))
         |            AS DECIMAL(38,0))), 0) AS s_hit
         |        FROM regs$gby),
         |r AS (SELECT $g n_hit, n_zero,
         |        $AlphaNum / CAST(s_hit + CAST(n_zero AS DECIMAL(38,0)) *
         |          CAST(4611686018427387904 AS DECIMAL(38,0)) AS DOUBLE) AS raw
         |      FROM agg)
         |SELECT ${gout}n_hit, n_zero,
         |  CAST(round(CASE WHEN n_zero > 0 AND raw <= ${2.5 * M}
         |    THEN $M.0 * ln($M.0 / n_zero) ELSE raw END * 1e6) AS BIGINT) AS est_e6
         |FROM r""".stripMargin
    }
    /** CountMin full-recompute twin: counters over the WHOLE corpus,
      * probes = top-20 of `probeWordsSql` (ties broken by word — a
      * total order, so LIMIT is deterministic in both engines);
      * `withExact` adds the exact_cnt column (the batch dashboard
      * shape — the incremental query carries estimates only). */
    def cmSql(probeWordsSql: String, withExact: Boolean): String = {
      val exactCol = if (withExact) "p.exact_cnt, " else ""
      s"""WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |rows_ AS (SELECT unnest(range(0, $CmD)) AS rr),
         |pw AS ($probeWordsSql),
         |probes AS (SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt
         |           FROM pw GROUP BY w ORDER BY exact_cnt DESC, w LIMIT 20),
         |cells AS (SELECT rr,
         |            ${TextQueries.phashSql("concat(CAST(rr AS VARCHAR), ':', w)")}
         |              % $CmW AS cc,
         |            CAST(count(*) AS BIGINT) AS cnt
         |          FROM words CROSS JOIN rows_ GROUP BY 1, 2),
         |pcells AS (SELECT p.w, rr,
         |             ${TextQueries.phashSql("concat(CAST(rr AS VARCHAR), ':', p.w)")}
         |               % $CmW AS cc
         |           FROM probes p CROSS JOIN rows_),
         |est AS (SELECT w, min(coalesce(c.cnt, CAST(0 AS BIGINT))) AS est_cnt
         |        FROM pcells LEFT JOIN cells c USING (rr, cc) GROUP BY w)
         |SELECT p.w, ${exactCol}e.est_cnt
         |FROM probes p JOIN est e USING (w)""".stripMargin
    }
    Map(
      "sketch_distinct" -> hllSql(
        "SELECT unnest(string_split(text, ' ')) AS w FROM documents"),
      "sketch_distinct_incr" -> hllSql(
        """SELECT unnest(string_split(text, ' ')) AS w FROM documents
          |  WHERE doc_id % 10 <> 9
          |  UNION ALL
          |  SELECT unnest(string_split(CASE WHEN doc_id % 10 = 3
          |    THEN text || ' v2' ELSE text END, ' ')) AS w
          |  FROM documents WHERE doc_id % 10 <> 4""".stripMargin),
      "sketch_distinct_by" -> hllSql(
        "SELECT source, unnest(string_split(text, ' ')) AS w FROM documents",
        grp = Some("source")),
      "sketch_freq" -> cmSql(probeWordsSql =
        "SELECT unnest(string_split(text, ' ')) AS w FROM documents",
        withExact = true),
      "sketch_freq_incr" -> cmSql(probeWordsSql =
        """SELECT unnest(string_split(text, ' ')) AS w FROM documents
          |  WHERE doc_id % 2 = 1""".stripMargin,
        withExact = false),
      "sketch_quantiles" ->
        """WITH sig AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
          |               CAST(length(text) AS BIGINT) AS nc FROM documents),
          |h AS (
          |  SELECT 'n_tokens' AS signal, nt AS bucket,
          |    CAST(count(*) AS BIGINT) AS cnt FROM sig GROUP BY nt
          |  UNION ALL
          |  SELECT 'mean_word_len' AS signal, (1000 * (nc - nt + 1)) // nt AS bucket,
          |    CAST(count(*) AS BIGINT) AS cnt FROM sig GROUP BY 2),
          |c AS (SELECT signal, bucket, cnt,
          |        sum(cnt) OVER (PARTITION BY signal ORDER BY bucket) AS cum,
          |        sum(cnt) OVER (PARTITION BY signal) AS n FROM h),
          |q AS (SELECT unnest([5, 25, 50, 75, 95]) AS q_pct),
          |sel AS (SELECT signal, q_pct, min(bucket) AS bucket
          |        FROM c CROSS JOIN q
          |        WHERE cum >= (q_pct * (n - 1)) // 100 + 1
          |        GROUP BY signal, q_pct)
          |SELECT signal, CAST(q_pct AS INT) AS q_pct,
          |  CASE WHEN signal = 'mean_word_len' THEN CAST(bucket AS DOUBLE) / 1000.0
          |       ELSE CAST(bucket AS DOUBLE) END AS value
          |FROM sel""".stripMargin,

      // the grouped twin: identical math with source in every partition
      "sketch_quantiles_by" ->
        """WITH sig AS (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
          |               CAST(length(text) AS BIGINT) AS nc FROM documents),
          |h AS (
          |  SELECT source, 'n_tokens' AS signal, nt AS bucket,
          |    CAST(count(*) AS BIGINT) AS cnt FROM sig GROUP BY source, nt
          |  UNION ALL
          |  SELECT source, 'mean_word_len' AS signal, (1000 * (nc - nt + 1)) // nt AS bucket,
          |    CAST(count(*) AS BIGINT) AS cnt FROM sig GROUP BY 1, 3),
          |c AS (SELECT source, signal, bucket, cnt,
          |        sum(cnt) OVER (PARTITION BY source, signal ORDER BY bucket) AS cum,
          |        sum(cnt) OVER (PARTITION BY source, signal) AS n FROM h),
          |q AS (SELECT unnest([5, 25, 50, 75, 95]) AS q_pct),
          |sel AS (SELECT source, signal, q_pct, min(bucket) AS bucket
          |        FROM c CROSS JOIN q
          |        WHERE cum >= (q_pct * (n - 1)) // 100 + 1
          |        GROUP BY source, signal, q_pct)
          |SELECT source, signal, CAST(q_pct AS INT) AS q_pct,
          |  CASE WHEN signal = 'mean_word_len' THEN CAST(bucket AS DOUBLE) / 1000.0
          |       ELSE CAST(bucket AS DOUBLE) END AS value
          |FROM sel""".stripMargin)
  }
}
