package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Two-pass partition-and-stitch replacements for globally-ordered
  * windows — the msMarkers-offset trick the reference plays for its
  * millisecond-marker interpolation (fprocessing.py:664-697): compute
  * partition-local results under a monotone chunk key, collect ONE tiny
  * row per chunk (count / final value), stitch the cross-chunk
  * carry/offset on the driver, and broadcast it back.
  *
  * A bare `Window.orderBy` with no partitionBy forces every row through
  * a single task (Spark's own WindowExec warning) — correct, but a
  * scale-killer at the 100 TB design point. Here every full-data window
  * is partitioned by `_chunk`, so all heavy passes parallelize; the only
  * driver-side state is O(#chunks), which the caller bounds by choosing
  * the chunk granularity (e.g. one chunk per hour of event time, or per
  * 1e6-wide id range — at 1e12 rows that is ~1e6 tiny tuples, KBs).
  *
  * The chunk column MUST be monotone non-decreasing along the global
  * order (equal-order rows land in the same chunk), so chunk boundaries
  * respect the total order and per-chunk results concatenate exactly.
  */
object Stitch {

  /** Distinct chunks with row counts, sorted ascending — the tiny
    * driver-side stitch table. */
  private def chunkCounts(d: DataFrame): Array[(Long, Long)] =
    d.groupBy("_chunk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)

  /** Global last-non-null carry-forward of `payload` (DoubleType) over
    * the total order `ord`, equal to
    * `last(payload, ignoreNulls=true) OVER (ORDER BY ord ROWS UNBOUNDED
    * PRECEDING)` but with no global window: pass 1 computes the
    * within-chunk carry, a per-chunk aggregate takes each chunk's final
    * non-null payload (`max_by` on the order key — one row per chunk),
    * the driver prefix-scans those finals into a per-chunk incoming
    * carry, and a broadcast join + coalesce stitches the two.
    */
  def carryForward(df: DataFrame, chunk: Column, ord: Seq[Column],
                   payload: Column, out: String): DataFrame = {
    val d = df.withColumn("_chunk", chunk.cast("long")).withColumn("_p", payload)
    val w = Window.partitionBy(col("_chunk")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = d.withColumn("_within", last(col("_p"), ignoreNulls = true).over(w))
    // one row per chunk that contains any non-null payload
    val finals = d.filter(col("_p").isNotNull)
      .groupBy("_chunk").agg(max_by(col("_p"), struct(ord: _*)).as("_last"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val chunks = chunkCounts(d).map(_._1)
    // incoming carry for chunk i = final value of the latest earlier
    // chunk that saw a non-null payload
    var run: Option[Double] = None
    val carries = chunks.map { c =>
      val in = run
      finals.get(c).foreach(v => run = Some(v))
      (c, in)
    }.collect { case (c, Some(v)) => (c, v) }
    val spark = df.sparkSession
    import spark.implicits._
    val carryDF = broadcast(carries.toSeq.toDF("_chunk", "_carry"))
    within.join(carryDF, Seq("_chunk"), "left")
      .withColumn(out, coalesce(col("_within"), col("_carry")))
      .drop("_chunk", "_p", "_within", "_carry")
  }

  /** Global 1-based sequence numbers over the total order `ord` (column
    * `seq`, LongType), restricted to `lo..hi`: per-chunk counts are
    * collected (tiny), prefix-summed into offsets on the driver, chunks
    * whose range misses [lo, hi] are PRUNED before any window runs, and
    * the surviving chunks get `row_number + offset` under a partitioned
    * window. With a narrow range this touches only the chunks that can
    * contain it — the global-sort equivalent would order everything.
    */
  def globalSeq(df: DataFrame, chunk: Column, ord: Seq[Column],
                lo: Long = 1L, hi: Long = Long.MaxValue): DataFrame = {
    val d = df.withColumn("_chunk", chunk.cast("long"))
    var off = 0L
    val offsets = chunkCounts(d).map { case (c, n) => val o = off; off += n; (c, o, n) }
    val live = offsets.filter { case (_, o, n) => o < hi && o + n >= lo }
    val spark = df.sparkSession
    import spark.implicits._
    val offDF = broadcast(live.map(t => (t._1, t._2)).toSeq.toDF("_chunk", "_off"))
    val w = Window.partitionBy(col("_chunk")).orderBy(ord: _*)
    d.join(offDF, Seq("_chunk")) // inner join drops pruned chunks
      .withColumn("seq", row_number().over(w).cast("long") + col("_off"))
      .filter(col("seq") >= lo && col("seq") <= hi)
      .drop("_chunk", "_off")
  }

  /** Global INCLUSIVE running sum of `value` (cast to long) over the
    * total order `ord` — `sum(value) OVER (ORDER BY ord ROWS UNBOUNDED
    * PRECEDING)` without the single-partition window: pass 1 computes
    * the within-chunk cumsum under a partitioned window, a per-chunk
    * aggregate collects the tiny (chunk, total) table, the driver
    * prefix-sums it into each chunk's incoming offset, and a broadcast
    * join adds the two. Driver state is O(#chunks), bounded by the
    * caller's chunk granularity. */
  def globalCumsum(df: DataFrame, chunk: Column, ord: Seq[Column],
                   value: Column, out: String): DataFrame = {
    val d = df.withColumn("_chunk", chunk.cast("long"))
      .withColumn("_v", value.cast("long"))
    val w = Window.partitionBy(col("_chunk")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = d.withColumn("_within", sum(col("_v")).over(w))
    val totals = d.groupBy("_chunk").agg(sum(col("_v")).as("_t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var run = 0L
    val offsets = totals.map { case (c, t) => val o = run; run += t; (c, o) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDF = broadcast(offsets.toSeq.toDF("_chunk", "_off"))
    within.join(offDF, Seq("_chunk"), "left")
      .withColumn(out, col("_within") + col("_off"))
      .drop("_chunk", "_v", "_within", "_off")
  }

  /** `max(value) OVER (ORDER BY ord ROWS BETWEEN CURRENT ROW AND
    * `follow` FOLLOWING)` without a global window. Rows near a chunk's
    * end need up to `follow` rows from later chunks, so each chunk
    * forwards its first min(count, follow) rows ("head") to the earlier
    * chunks that need them; the driver walks the tiny chunk-count table
    * to decide which chunks feed which (normally just the predecessor —
    * chains only when chunks hold fewer than `follow` rows), then one
    * partitioned window over own+borrowed rows evaluates the frame and
    * borrowed rows are dropped from the output.
    */
  def blockMax(df: DataFrame, chunk: Column, ordCol: Column, valCol: Column,
               follow: Int, out: String): DataFrame = {
    val d = df.withColumn("_chunk", chunk.cast("long"))
    val counts = chunkCounts(d)
    // (srcChunk, dstChunk): src's head rows are appended to dst's window
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (i <- counts.indices) {
      var need = follow.toLong
      var j = i + 1
      while (need > 0 && j < counts.length) {
        pairs += counts(j)._1 -> counts(i)._1
        need -= math.min(counts(j)._2, follow.toLong)
        j += 1
      }
    }
    val rankW = Window.partitionBy(col("_chunk")).orderBy(ordCol)
    val ranked = d.withColumn("_rk", row_number().over(rankW))
    val spark = df.sparkSession
    import spark.implicits._
    val pairDF = broadcast(pairs.toSeq.toDF("_src", "_dst"))
    val borrowed = ranked.filter(col("_rk") <= follow)
      .join(pairDF, col("_chunk") === col("_src"))
      .withColumn("_chunk", col("_dst")).drop("_src", "_dst")
      .withColumn("_own", lit(false))
    val aug = ranked.withColumn("_own", lit(true)).unionByName(borrowed)
    val w = Window.partitionBy(col("_chunk")).orderBy(ordCol)
      .rowsBetween(Window.currentRow, follow)
    aug.withColumn(out, max(valCol).over(w))
      .filter(col("_own"))
      .drop("_chunk", "_rk", "_own")
  }
}
