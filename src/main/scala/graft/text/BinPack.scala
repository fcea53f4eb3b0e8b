package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Best-fit-decreasing sequence packing over the LENGTH HISTOGRAM —
  * the padding-minimizing alternative to [[TextQueries.packCounts]]'s
  * sequential chunking. `txt_pack` concatenates the corpus in doc_id
  * order and slices fixed windows (zero padding, but documents split
  * across windows = cross-contaminated attention); this operator packs
  * each document WHOLE into a window, choosing bins best-fit-decreasing
  * so padding waste stays near the bin-packing optimum (FFD/BFD are
  * 11/9·OPT+O(1); random-arrival greedy is ~25% waste on web-corpus
  * length distributions — Krell et al. 2021, arXiv:2107.02027, frame
  * the histogram form used here).
  *
  * Scale shape: classic BFD is a sequential loop over N items — a
  * driver wall at corpus scale. But the packing decision only depends
  * on the LENGTH of each doc, and lengths are bounded by the window
  * `budget`, so the corpus collapses to a ≤`budget`-row histogram: ONE
  * corpus aggregate collects it, the driver runs batched BFD over
  * (length, count) pairs in O(distinct-lengths × groups) producing a
  * compact placement recipe (rank-range → bin arithmetic), and a
  * broadcast join maps every doc to its bin by its rank WITHIN its
  * length class. The batched loop is item-by-item-faithful: uniform
  * bin groups split only when a placement consumes part of a group, so
  * the recipe is bit-identical to simulating docs one at a time
  * (BinPackSpec pins this against a direct simulation).
  *
  * Per-class ranks run partition-and-stitch ([[graft.ops.Stitch
  * .globalSeq]] under a (length, doc_id-chunk) key), never a
  * whole-class window partition — a 100 TB corpus with one dominant
  * length would otherwise funnel through a single task.
  */
object BinPack {
  type Q = (SparkSession, String) => DataFrame

  /** One placement event of the BFD recipe: class-ranks
    * [rankLo, rankHi) of docs with packed length `len` land in bin
    * `baseBin + (rank − rankLo) div per` — `per` consecutive ranks per
    * bin, exactly how item-by-item best-fit piles equal lengths into
    * the open bin before moving to the next. */
  final case class PackBlock(len: Long, rankLo: Long, rankHi: Long,
                             baseBin: Long, per: Long)

  /** Uniform group of `mult` bins [base, base+mult) at equal residual
    * capacity — the batched stand-in for individual bins. */
  private final class Group(var residual: Long, val base: Long, val mult: Long)

  /** Batched best-fit-decreasing over a (length → count) histogram.
    * Pure and deterministic: lengths descend, best fit = smallest
    * residual ≥ len with ties to the lowest bin id, fresh bins open at
    * the next id. Returns the placement blocks and the bin count.
    * Driver cost is O(distinct-lengths × groups); groups grow by ≤ 2
    * per placement, so the recipe stays small (≤ a few × distinct
    * lengths) no matter the corpus row count. */
  def bfdRecipe(hist: Seq[(Long, Long)], budget: Long): (Vector[PackBlock], Long) = {
    require(budget >= 1, s"window budget must be >= 1, got $budget")
    hist.foreach { case (l, c) =>
      require(l >= 1 && l <= budget, s"length $l outside [1, $budget] — clamp first")
      require(c >= 1, s"empty histogram bucket at length $l")
    }
    require(hist.map(_._1).distinct.size == hist.size, "duplicate histogram lengths")
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val blocks = Vector.newBuilder[PackBlock]
    var nextBin = 0L
    hist.sortBy { case (l, _) => -l }.foreach { case (l, c0) =>
      var rank = 0L
      var remaining = c0
      while (remaining > 0) {
        var bi = -1
        var i = 0
        while (i < groups.length) {
          val g = groups(i)
          if (g.residual >= l && (bi < 0 || g.residual < groups(bi).residual ||
              (g.residual == groups(bi).residual && g.base < groups(bi).base))) bi = i
          i += 1
        }
        if (bi < 0) {
          // nothing fits: item-by-item opens a bin, piles floor(B/l)
          // copies into it, then the next — open that many bins as one
          // uniform group and let the generic fill below do exactly that
          val p = budget / l
          val nb = (remaining + p - 1) / p
          groups += new Group(budget, nextBin, nb)
          nextBin += nb
          bi = groups.length - 1
        }
        val g = groups(bi)
        val p = g.residual / l                  // copies each bin takes
        val take = math.min(remaining, g.mult * p)
        val full = take / p                     // bins topped to p copies
        val rem = take % p                      // copies into one partial bin
        if (full > 0) blocks += PackBlock(l, rank, rank + full * p, g.base, p)
        if (rem > 0) blocks += PackBlock(l, rank + full * p, rank + take, g.base + full, rem)
        // split the uniform group into topped / partial / untouched
        groups.remove(bi)
        var ins = bi
        if (full > 0) { groups.insert(ins, new Group(g.residual - p * l, g.base, full)); ins += 1 }
        if (rem > 0) { groups.insert(ins, new Group(g.residual - rem * l, g.base + full, 1)); ins += 1 }
        val untouched = g.mult - full - (if (rem > 0) 1L else 0L)
        if (untouched > 0) groups.insert(ins,
          new Group(g.residual, g.base + full + (if (rem > 0) 1L else 0L), untouched))
        rank += take
        remaining -= take
      }
    }
    (blocks.result(), nextBin)
  }

  /** Recipe (budget, blocks) of the last [[bfdPackCounts]] run, for the
    * oracle builder (the cachedMerges pattern — absent until the query
    * runs, so a stale oracle can never cross a fresh recipe). */
  @volatile private[text] var cachedBfd: Option[(Long, Vector[PackBlock])] = None

  /** Stitch chunk stride: doc_id div chunkWidth must stay below this or
    * distinct lengths would alias into each other's chunk ranges. 2^40
    * chunks × the default width is ~10^17 doc ids — beyond any corpus. */
  private val ChunkStride = 1L << 40

  /** BFD packing over a precomputed (doc_id, n_tokens) frame: returns
    * (doc_id, n_tokens, bin_id) with every doc whole in exactly one
    * bin and every bin's fill ≤ `budget`. Lengths clamp to [1, budget]
    * (an over-long doc occupies a full window, truncated — the packing
    * decision; slicing its tail is [[TextQueries.packCounts]]'s job).
    *
    * One corpus aggregate (the ≤budget-row histogram) + one stitched
    * rank pass + two broadcast joins (class offsets, recipe blocks);
    * driver state is O(distinct lengths), never O(docs). */
  def bfdPackCounts(withN: DataFrame, budget: Long,
                    chunkWidth: Long = 100000L): DataFrame = {
    require(budget >= 1 && budget < (1L << 22),
      s"budget must be in [1, 2^22) (chunk-key headroom), got $budget")
    val spark = withN.sparkSession
    import spark.implicits._
    val lens = withN.select(col("doc_id"),
      least(lit(budget), greatest(lit(1L), col("n_tokens").cast("long"))).as("len"))
    val hist = lens.groupBy("len").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val (blocks, _) = bfdRecipe(hist.toSeq, budget)
    cachedBfd = Some((budget, blocks))
    // class rank = global (len, doc_id) seq − start offset of the class
    var run = 0L
    val offsets = hist.map { case (l, c) => val o = run; run += c; (l, o) }
    val offDf = broadcast(offsets.toSeq.toDF("len", "class_start"))
    val blockDf = broadcast(blocks.map(b => (b.len, b.rankLo, b.rankHi, b.baseBin, b.per))
      .toDF("len", "lo", "hi", "base", "per"))
    val ranked = graft.ops.Stitch.globalSeq(lens,
      col("len") * lit(ChunkStride) + expr(s"doc_id div $chunkWidth"),
      Seq(col("doc_id")))
      .join(offDf, Seq("len"))
      .withColumn("rk", col("seq") - lit(1L) - col("class_start"))
    ranked.join(blockDf, Seq("len"))
      .filter(col("rk") >= col("lo") && col("rk") < col("hi"))
      .select(col("doc_id"), col("len").as("n_tokens"),
        expr("base + (rk - lo) div per").as("bin_id"))
  }

  /** [[bfdPackCounts]] over the documents table at whitespace token
    * counts — the txt_pack twin with whole-document windows. */
  def bfdPack(docs: DataFrame, budget: Long,
              chunkWidth: Long = 100000L): DataFrame =
    bfdPackCounts(docs.select(col("doc_id"),
      TextQueries.wsTokenCount("text").cast("long").as("n_tokens")),
      budget, chunkWidth)

  /** Packing report over a [[bfdPackCounts]] assignment: bin count,
    * doc count, packed token total, and efficiency (packed tokens /
    * window capacity) in ppm — as a double ratio, not long·1e6 (which
    * wraps past ~9.2e12 tokens; the zipfProfile discipline), with the
    * identical IEEE expression shape in the oracle. */
  def packStats(assign: DataFrame, budget: Long): DataFrame =
    assign.agg(
      (max(col("bin_id")) + 1L).as("n_bins"),
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("total_tokens"))
      .select(col("n_bins"), col("n_docs"), col("total_tokens"),
        floor(col("total_tokens").cast("double") /
          (col("n_bins") * lit(budget)).cast("double") * lit(1e6))
          .cast("long").as("eff_ppm"))

  private val Budget = 512L

  def queries: Map[String, Q] = Map(
    "txt_pack_bfd" -> { (s, dir) => bfdPack(Tables.documents(s, dir), Budget) },
    "txt_pack_bfd_stats" -> { (s, dir) =>
      packStats(bfdPack(Tables.documents(s, dir), Budget), Budget)
    })

  /** Oracles render the driver-computed recipe as literals and replay
    * the rank arithmetic: row_number within the length class joins the
    * block ranges, bin = base + (rank−lo) // per. Engine and oracle
    * share the recipe by construction ([[cachedBfd]]); the RECIPE
    * itself is pinned separately against item-by-item simulation in
    * BinPackSpec. */
  def oracles: Map[String, String] = cachedBfd match {
    case None => Map.empty
    case Some((budget, blocks)) =>
      val vals = blocks.map(b =>
        s"(${b.len}, ${b.rankLo}, ${b.rankHi}, ${b.baseBin}, ${b.per})").mkString(", ")
      val assign =
        s"""WITH t AS (SELECT doc_id,
           |  least($budget, greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT))) AS n_tokens
           |FROM documents),
           |r AS (SELECT doc_id, n_tokens,
           |  CAST(row_number() OVER (PARTITION BY n_tokens ORDER BY doc_id) AS BIGINT) - 1 AS rk
           |FROM t),
           |b (len, lo, hi, base, per) AS (VALUES $vals),
           |a AS (SELECT r.doc_id, r.n_tokens,
           |  CAST(b.base + (r.rk - b.lo) // b.per AS BIGINT) AS bin_id
           |FROM r JOIN b ON r.n_tokens = b.len AND r.rk >= b.lo AND r.rk < b.hi)""".stripMargin
      Map(
        "txt_pack_bfd" -> s"$assign\nSELECT doc_id, n_tokens, bin_id FROM a",
        "txt_pack_bfd_stats" ->
          s"""$assign
             |SELECT max(bin_id) + 1 AS n_bins, count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  CAST(floor(CAST(sum(n_tokens) AS DOUBLE)
             |    / CAST((max(bin_id) + 1) * $budget AS DOUBLE) * 1e6) AS BIGINT) AS eff_ppm
             |FROM a""".stripMargin)
  }
}
