package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-pattern utilities (SURVEY.md §4.2 / the 100 TB checklist):
  * skew-salted joins and bucketed co-located joins. These are the two
  * shuffle-taming tools AQE cannot always provide on its own (AQE
  * handles *detected* skew post-hoc; salting handles known-skewed keys
  * up front; bucketing removes the shuffle entirely for repeated joins
  * on the same key).
  */
object Scale {

  /** Skew-salted equi-join: replicate each right row `saltFactor` times
    * and scatter left rows uniformly across the salt space, so one hot
    * key spreads over `saltFactor` reducers instead of one.
    *
    * EXACT for inner (and left-semi) equi-joins at ARBITRARY N:M key
    * multiplicity: every left row carries exactly one salt value, every
    * right row exists at every salt value, so each matching (left,
    * right) row pair meets in exactly one (key, salt) cell — identical
    * left rows share a salt and still each pair once. The replication
    * cost is saltFactor× the RIGHT side, which is why callers keep the
    * smaller/deduped side right when they can (the 1:N framing is an
    * efficiency guideline, not a correctness precondition — containJoin
    * legitimately salts a many-rows-per-key right side). NOT exact for
    * outer joins (an unmatched left row would surface once, but an
    * unmatched RIGHT row would surface saltFactor times).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1)
    // right/full outer would surface each unmatched right row once per
    // salt replica — those join types are incorrect under salting
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi joins, not $joinType")
    val saltCol = "_graft_salt"
    require(!left.columns.contains(saltCol) && !right.columns.contains(saltCol),
      s"inputs must not already contain a $saltCol column")
    // salt must be a DETERMINISTIC function of row content: a salt from
    // monotonically_increasing_id (or rand) changes across task retries,
    // which silently loses/duplicates rows through the shuffle
    // (the SPARK-23207 failure class)
    val saltedLeft = left.withColumn(saltCol,
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val saltedRight = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(saltedRight, Seq(key, saltCol), joinType).drop(saltCol)
  }

  /** All intra-group pairs (`id_1 < id_2` within equal `keys`) with
    * skew-aware work distribution — the candidate-pair self-join of LSH
    * dedup. A degenerate "identical template" bucket (one band signature
    * shared by n docs) sends n² pair-work through ONE reducer in a plain
    * equi-self-join; here groups above `hotThreshold` are triangle-
    * salted: each member gets a deterministic salt s ∈ [0, S), the pair
    * space is tiled into S(S+1)/2 cells (i ≤ j), a row serves as the
    * left side of cells (s, j ≥ s) and the right side of cells (i ≤ s,
    * s), and each unordered pair materializes in exactly one cell — so
    * the hot group's n² work spreads over ~S²/2 reducers while the
    * output stays EXACTLY the all-pairs result (same oracle). Cold
    * groups take the plain join, so the ~S× replication is paid only on
    * the skewed keys (detected by one cheap count-aggregate, broadcast
    * back).
    *
    * Output columns: keys ++ (id_1, id_2).
    */
  def selfPairs(df: DataFrame, keys: Seq[String], id: String,
                saltFactor: Int = 4, hotThreshold: Long = 1000L,
                hotKeyCap: Int = 100000): DataFrame = {
    require(saltFactor > 1 && hotKeyCap > 0)
    val outCols = (keys.map(k => col(s"a.$k")) :+
      col(s"a.$id").as(s"${id}_1")) :+ col(s"b.$id").as(s"${id}_2")
    def keyCond = keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)

    // Skew detection first, as its own cheap (map-side-combinable)
    // aggregate: when NO group exceeds the threshold — the common case —
    // short-circuit to the plain self-join and pay nothing else.
    // Measured at sf0.1: always-on salting machinery (flagging join +
    // empty hot branch + union) taxed the unskewed dedup_lsh_pairs
    // ~2x (4.3 s vs 2.0 s steady-state); detection costs one agg pass.
    val cnt = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
    // ONE materialization of the detection aggregate: hot keys are few by
    // definition (each holds > hotThreshold rows), so collect them to the
    // driver and build the broadcast side locally — reusing the hotCnt
    // DataFrame in the join lineage would re-run the full aggregate.
    // Heaviest groups first, so if the cap truncates, it truncates the
    // groups that need salting least; the overflow still gets correct
    // output through the plain join, but say so loudly rather than let
    // the skew protection silently stop applying.
    val hotCollected = cnt.filter(col("_n") > hotThreshold)
      .orderBy(col("_n").desc)
      .limit(hotKeyCap + 1)
      .select(keys.map(col): _*)
      .collect()
    if (hotCollected.length > hotKeyCap) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"selfPairs: more than $hotKeyCap groups exceed hotThreshold=$hotThreshold; " +
          s"only the $hotKeyCap heaviest are salted — the rest take the unsalted join " +
          "(output stays correct, skew protection degrades)")
    }
    val hotRows = hotCollected.take(hotKeyCap)
    if (hotRows.isEmpty) {
      return df.as("a").join(df.as("b"), keyCond && col(s"a.$id") < col(s"b.$id"))
        .select(outCols: _*)
    }
    val spark = df.sparkSession
    val keySchema = org.apache.spark.sql.types.StructType(
      keys.map(k => df.schema(k)))
    val hotKeys = broadcast(
      spark.createDataFrame(spark.sparkContext.parallelize(hotRows.toSeq, 1), keySchema)
        .withColumn("_hot", lit(true)))
    val flagged = df.join(hotKeys, keys, "left")
    val cold = flagged.filter(col("_hot").isNull).drop("_hot")
    val hot = flagged.filter(col("_hot") === true).drop("_hot")

    val coldPairs = cold.as("a").join(cold.as("b"),
        keyCond && col(s"a.$id") < col(s"b.$id"))
      .select(outCols: _*)

    // cell (i, j), i <= j, holds the pairs whose two salts are {i, j}:
    // a row with salt s is the LEFT side of cells (s, j >= s) and the
    // RIGHT side of cells (i <= s, s), so in any joined pair the left
    // salt <= right salt by construction. Mixed-salt cells see each
    // unordered pair exactly once (restore id order via least/greatest);
    // same-salt cells see it twice, deduped by id <.
    val S = saltFactor
    val salted = hot.withColumn("_s", pmod(hash(col(id)), lit(S)).cast("int"))
    val left = salted.withColumn("_cell",
      explode(expr(s"transform(sequence(_s, ${S - 1}), j -> _s * $S + j)")))
    val right = salted.withColumn("_cell",
      explode(expr(s"transform(sequence(0, _s), i -> i * $S + _s)")))
    val hotPairs = left.as("a").join(right.as("b"),
        keyCond && col("a._cell") === col("b._cell") &&
          (col("a._s") =!= col("b._s") || col(s"a.$id") < col(s"b.$id")))
      .select((keys.map(k => col(s"a.$k")) :+
        least(col(s"a.$id"), col(s"b.$id")).as(s"${id}_1")) :+
        greatest(col(s"a.$id"), col(s"b.$id")).as(s"${id}_2"): _*)

    coldPairs.unionByName(hotPairs)
  }

  /** Exact q-quantile with linear interpolation (type-7: the formula
    * both Spark's `percentile` and DuckDB's `quantile_cont` use) at
    * bounded memory: Spark's exact `percentile` aggregate buffers a
    * counts-map of every distinct value per partition — fine at test
    * scale, unbounded at 100 TB. Here: bracket the target rank with one
    * `approxQuantile` pass, count rows below the bracket, pull ONLY the
    * bracket rows (≈2·eps·n by construction) and select the exact ranks
    * locally, widening the bracket in the rare case the sketch missed.
    */
  def exactQuantile(df: DataFrame, c: String, q: Double,
                    maxBandRows: Long = 4000000L): Double =
    exactQuantiles(df, Seq(c), q, maxBandRows)(c)

  /** Multi-column form sharing every distributed pass: one count
    * aggregate for all columns, one multi-column `approxQuantile` sketch
    * per round, one combined bracket-count aggregate per round — so
    * profiling k columns costs ~3 scans total, not ~4k. */
  def exactQuantiles(df: DataFrame, cols: Seq[String], q: Double,
                     maxBandRows: Long = 4000000L): Map[String, Double] =
    exactQuantileGrid(df, cols, Seq(q), maxBandRows)
      .map { case ((c, _), v) => c -> v }

  /** Full (column × quantile) grid, still at ~3 scans total: the count
    * aggregate, the sketch (one `approxQuantile` call carries every
    * cell's bracket probabilities for every open column), and the
    * bracket-count aggregate (4 sums per open cell) are each ONE
    * distributed pass per round regardless of how many quantiles are
    * asked for — so Tukey fences (q1 AND q3 over k signals) cost the
    * same scans as a single median. Only the capped interior collects
    * are per-cell, and cells of the same column whose brackets coincide
    * share one collect. */
  def exactQuantileGrid(df: DataFrame, cols: Seq[String], qs: Seq[Double],
                        maxBandRows: Long = 4000000L): Map[(String, Double), Double] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
    val d = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    // per-column non-null counts in ONE pass (percentile ignores nulls)
    val nAggs = cols.map(c => count(col(c)).as(s"_n_$c"))
    val nRow = d.agg(nAggs.head, nAggs.tail: _*).collect()(0)
    val n = cols.zipWithIndex.map { case (c, i) => c -> nRow.getLong(i) }.toMap
    cols.foreach(c => require(n(c) > 0, s"exactQuantile($c): no rows"))
    val cells: Seq[(String, Double)] = for (c <- cols; q <- qs.distinct) yield (c, q)
    val pos = cells.map { case cell @ (c, q) => cell -> q * (n(c) - 1) }.toMap
    val loRank = pos.map { case (cell, p) => cell -> math.floor(p).toLong }
    val hiRank = pos.map { case (cell, p) => cell -> math.ceil(p).toLong }
    // Spark Percentile's exact interpolation form (NOT lo+(hi-lo)*f,
    // which differs in the last ulp): integral rank returns the key
    def interp(cell: (String, Double), lo: Double, hi: Double): Double =
      if (loRank(cell) == hiRank(cell)) lo
      else (hiRank(cell) - pos(cell)) * lo + (pos(cell) - loRank(cell)) * hi

    val resolved = scala.collection.mutable.Map.empty[(String, Double), Double]
    var eps = 0.002
    var attempt = 0
    while (resolved.size < cells.length && attempt < 10) {
      val open = cells.filterNot(resolved.contains)
      val openCols = open.map(_._1).distinct
      // one sketch pass: every open quantile's two bracket probabilities,
      // applied to every open column (a column ignores probs belonging to
      // its already-resolved cells — extra probs cost nothing extra)
      val openQs = open.map(_._2).distinct
      val probs = openQs.flatMap(q =>
        Seq(math.max(0.0, q - eps), math.min(1.0, q + eps))).distinct.sorted
      val probIdx = probs.zipWithIndex.toMap
      val brackets = d.stat.approxQuantile(openCols.toArray, probs.toArray, eps / 4)
      val colBr = openCols.zip(brackets).toMap
      def ab(cell: (String, Double)): (Double, Double) = {
        val (c, q) = cell
        (colBr(c)(probIdx(math.max(0.0, q - eps))),
          colBr(c)(probIdx(math.min(1.0, q + eps))))
      }
      // resolve rank→value at the band EDGES by counts alone, so runs of
      // duplicated values (however huge) never need collecting; only the
      // strict interior (a, b) — ~2·eps·n rows minus the edge runs — is
      // pulled, and it is capped. All cells' 4 bracket counts ride one
      // aggregate pass.
      val cntAggs = open.flatMap { cell =>
        val c = cell._1
        val (a, b) = ab(cell)
        Seq(sum(when(col(c) < a, 1L).otherwise(0L)),
          sum(when(col(c) <= a, 1L).otherwise(0L)),
          sum(when(col(c) < b, 1L).otherwise(0L)),
          sum(when(col(c) <= b, 1L).otherwise(0L)))
      }
      val cnts = d.agg(cntAggs.head, cntAggs.tail: _*).collect()(0)
      var missed = false
      var tooWide = false
      // interior collects keyed by (column, bracket): adjacent quantiles
      // of one column whose sketch brackets coincide pull one band
      val interiorCache = scala.collection.mutable.Map.empty[(String, Double, Double), Array[Double]]
      open.zipWithIndex.foreach { case (cell, k) =>
        val c = cell._1
        val (a, b) = ab(cell)
        val below = cnts.getLong(4 * k)
        val leA = cnts.getLong(4 * k + 1)
        val ltB = cnts.getLong(4 * k + 2)
        val leB = cnts.getLong(4 * k + 3)
        if (below <= loRank(cell) && hiRank(cell) < leB) {
          if (ltB - leA <= maxBandRows) {
            lazy val interior = interiorCache.getOrElseUpdate((c, a, b),
              d.filter(col(c) > a && col(c) < b)
                .select(col(c)).collect().map(_.getDouble(0)).sorted)
            def valueAt(r: Long): Double =
              if (r < leA) a
              else if (r < ltB) interior((r - leA).toInt)
              else b
            resolved(cell) = interp(cell, valueAt(loRank(cell)), valueAt(hiRank(cell)))
          } else tooWide = true // covers the ranks but interior too big
        } else missed = true // sketch bracket missed the rank
      }
      // shared eps: fixing misses first (widen) dominates; once nothing
      // misses, tighten for the too-wide cells
      if (missed) eps *= 4 else if (tooWide) eps /= 4
      attempt += 1
    }
    require(resolved.size == cells.length,
      s"exactQuantile: bracket did not converge for ${cells.filterNot(resolved.contains).mkString(", ")}")
    resolved.toMap
  }

  /** Write `df` bucketed+sorted by the join key and register it as
    * `table` in the session catalog; joins between two tables bucketed
    * the same way run as SortMergeJoin over pre-bucketed scans with no
    * shuffle exchange.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** True if the physical plan of `df` contains a shuffle exchange
    * (hash, range, or single-partition — broadcast exchanges are not
    * shuffles and don't count). */
  def hasShuffle(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    Seq("Exchange hashpartitioning", "Exchange rangepartitioning", "Exchange SinglePartition")
      .exists(plan.contains)
  }

  /** Materialize a reused/iterated subtree to a compact in-memory table
    * and ASSERT the handoff happened: downstream plans must see a leaf
    * scan, never the original expression tree.
    *
    * This is the factored form of the iterated-plan checkpoint
    * discipline: when an expensive subtree (a window-min fingerprint
    * chain, a bucketed kNN join) is consumed more than once or fed into
    * an iteration, AQE/CollapseProject can re-inline it at each
    * consumer — re-running it per round, or multiplying per-element
    * expression cost once a downstream explode makes aliases
    * single-reference (measured: winnowIndex >10 min → 11.85 s,
    * knn-degree 78 → 31.5 s at 2M rows). `localCheckpoint` cuts the
    * lineage; the leaf-node require makes the cut LOAD-BEARING — if a
    * future Spark version returned a lazily-recomputed view here, every
    * routed operator would fail loudly instead of silently regressing.
    * Call it on the COMPACT representation (ids, fingerprints, edges) —
    * never on wide rows — so the materialized bytes are the same rows
    * the plan would shuffle anyway. */
  def materializeCompact(df: DataFrame, scope: String = "compact"): DataFrame = {
    val out = df.localCheckpoint()
    require(out.queryExecution.logical.children.isEmpty,
      "materializeCompact: checkpoint did not collapse the plan to a leaf scan — " +
        s"iterated consumers would re-inline the subtree:\n${out.queryExecution.logical}")
    val rdds = out.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    registerPin(scope, "checkpoint", rdds.map(_.id),
      () => rdds.foreach(_.unpersist(blocking = false)))
    out
  }

  /** SESSION-OWNED PINNED-STORAGE REGISTRY. Every frame this library
    * pins — [[materializeCompact]] localCheckpoints (LM vocabularies,
    * fingerprint indexes) and [[pinPersisted]] cache-manager persists
    * (the lshMatchesAgainst candidate/shingle frames) — registers here,
    * so a long-lived session (an ingest loop constructing LM queries
    * per corpus version, a per-crawl-batch dedup driver) can AUDIT its
    * pinned storage ([[pinnedCount]]/[[pinnedBytes]]) and SWEEP it
    * ([[releaseAllPinned]]) without `spark.catalog.clearCache()` — a
    * blunt session-wide hammer that also drops caches the caller does
    * not own. Without the sweep, checkpoint blocks accumulate across
    * corpus versions for the life of the session (Dataset.unpersist is
    * a NO-OP on them — see [[releaseCompact]]); with it, an ingest loop
    * can assert its storage is FLAT between batches (spec-pinned).
    * Entries are scoped: pass the scope to release one family (e.g.
    * `lsh_against`) and leave the rest pinned. */
  private final case class Pin(id: Long, scope: String, kind: String,
                               rddIds: Seq[Int], release: () => Unit)
  private val pinSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private val pins =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Pin]()

  private def registerPin(scope: String, kind: String, rddIds: Seq[Int],
                          release: () => Unit): Unit = {
    val id = pinSeq.incrementAndGet()
    pins.put(id, Pin(id, scope, kind, rddIds, release))
  }

  private def pinsFor(scope: Option[String]): Seq[Pin] = {
    import scala.jdk.CollectionConverters._
    pins.values.asScala.filter(p => scope.forall(_ == p.scope)).toSeq
  }

  /** Live registered pins (optionally one scope's). */
  def pinnedCount(scope: Option[String] = None): Int = pinsFor(scope).size

  /** Block-manager bytes (memory + disk) of the registered CHECKPOINT
    * pins, from the live RDD storage info. Persist pins report 0 here:
    * their storage belongs to the CacheManager (visible in its own
    * accounting) and materializes lazily at first read — this audit
    * counts the storage the session has irrevocably pinned. */
  def pinnedBytes(spark: SparkSession, scope: Option[String] = None): Long = {
    val ids = pinsFor(scope).flatMap(_.rddIds).toSet
    spark.sparkContext.getRDDStorageInfo
      .filter(i => ids.contains(i.id)).map(i => i.memSize + i.diskSize).sum
  }

  /** Release every registered pin (optionally one scope's): checkpoint
    * blocks unpersist at the RDD level, cache-manager persists
    * unpersist through the Dataset handle. Returns the number of pins
    * released. Checkpoint data is UNRECOVERABLE after release (the
    * lineage was truncated) — sweep only between units of work. */
  def releaseAllPinned(scope: Option[String] = None): Int = {
    val sel = pinsFor(scope)
    sel.foreach { p => p.release(); pins.remove(p.id) }
    sel.size
  }

  /** Persist `df` (lazily, through the cache manager) AND register the
    * pin so [[releaseAllPinned]] can sweep it — the registry-aware
    * spelling of `df.persist(level)` every in-library persist uses. */
  def pinPersisted(df: DataFrame, scope: String,
                   level: org.apache.spark.storage.StorageLevel =
                     org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val out = df.persist(level)
    registerPin(scope, "persist", Seq.empty,
      () => { out.unpersist(blocking = false); () })
    out
  }

  /** Release the block-manager storage of a [[materializeCompact]]
    * frame. `Dataset.unpersist` is a NO-OP for localCheckpoint frames —
    * it only uncaches CacheManager entries, and the checkpoint's blocks
    * were persisted at the RDD level, never registered with the cache
    * manager — so a caller that "released" a checkpointed index with
    * `unpersist()` silently pinned it for the session. This walks the
    * frame's RDD leaves and unpersists them directly. Safe only when
    * the frame will not be read again: a localCheckpoint truncated its
    * lineage, so the data is UNRECOVERABLE after release. */
  def releaseCompact(df: DataFrame): Unit = {
    val rdds = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    rdds.foreach(_.unpersist(blocking = false))
    // deregister any pin that tracked these blocks — a direct release
    // must not leave a dangling registry entry (double-release via a
    // later releaseAllPinned would be a harmless no-op, but the audit
    // counts would lie)
    val ids = rdds.map(_.id).toSet
    import scala.jdk.CollectionConverters._
    pins.values.asScala.filter(_.rddIds.exists(ids.contains))
      .foreach(p => pins.remove(p.id))
  }

  /** True if the physical plan funnels all rows into one partition —
    * the single-task global-window/global-sort scale-killer (an
    * `Exchange SinglePartition` feeding WindowExec/SortExec). Used by
    * ScaleSpec to assert the partition-and-stitch rewrites stay
    * partition-parallel. */
  def hasSinglePartitionExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange SinglePartition")

  /** EXECUTE `df` and count the file-source scans its final physical
    * plan actually ran — the redundant-lineage audit primitive.
    *
    * Why executed, not analyzed: a logical plan that mentions one
    * source N times can still execute it once (ReusedExchange,
    * persisted caches) or — the failure class this exists for — really
    * scan it N times because broadcast branches defeat exchange reuse
    * (each consumer's canonicalized subtree differs, so the optimizer
    * never unifies them). The KN-5 scorer shipped two green rounds
    * with a scaladoc claiming "the corpus is never re-scanned" while
    * its executed plan ran ELEVEN parquet scans; plan-shape pins
    * (exchange kinds, pushed filters) cannot see that class — only a
    * scan COUNT on the executed plan can.
    *
    * Counting convention (what ScanCountSpec's expected map means):
    *  - AQE final plans are traversed through their query stages;
    *  - `ReusedExchange`/`ReusedSubquery` subtrees count ZERO (they
    *    re-read a materialized exchange, not the source);
    *  - each DISTINCT in-memory cache (`persist`) counts its BUILD
    *    plan's scans exactly once, no matter how many `InMemoryTable`
    *    scans read it;
    *  - RDD leaves (`materializeCompact` checkpoints, parallelized
    *    fixtures) count zero — the scans that BUILT a checkpoint ran
    *    at construction time, before this call, by design: eager
    *    materialization is the fix this primitive audits for;
    *  - both file-source forms (v1 `FileSourceScan`, v2 `BatchScan`)
    *    count one each.
    *
    * The frame is driven by `collect()` so the SAME QueryExecution the
    * count inspects is the one that ran (a write would execute a fresh
    * one) — call at test scale only. */
  def executedFileScans(df: DataFrame): Int = {
    df.collect()
    val seenCaches = scala.collection.mutable.Set.empty[AnyRef]
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => 0
      case _: org.apache.spark.sql.execution.ReusedSubqueryExec => 0
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        // Key on the shared CachedRDDBuilder, NOT the relation instance:
        // CacheManager substitutes a fresh InMemoryRelation (newInstance,
        // fresh output attrs) at EVERY consumer site, so identity-keyed
        // dedup would count one cache k times for k readers. The builder
        // object is the one thing all substituted instances share — it is
        // what guarantees the cache builds once.
        if (seenCaches.add(i.relation.cacheBuilder)) walk(i.relation.cachedPlan) else 0
      case _: org.apache.spark.sql.execution.FileSourceScanExec => 1
      case _: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => 1
      case other =>
        other.children.map(walk).sum + other.subqueries.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
