package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.binning.BinAxis
import graft.streaming.StreamOps

/** Streaming windowed histogram driven synchronously over the parquet
  * events (memory sink, complete mode) must equal the batch plan on the
  * same data — the aggregate is algebraic, so batch and streaming agree.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming windowed histogram == batch result") {
    val ax = BinAxis("value", 20, 0.0, 500.0)
    // stage the events file into a drop-folder (file streaming sources
    // monitor directories)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dropDir.resolve("events_0.parquet"))
    val streamed = StreamOps.streamingHistogram(
      StreamOps.readEvents(spark, dropDir.toString), ax)
    val q = streamed.writeStream
      .format("memory").queryName("stream_hist")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("stream_hist").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val exp = StreamOps.batchHistogram(Tables.events(spark, sfDir), ax)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == exp)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("as-of join matches window-free reference computation") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("ts").as("p_ts"), col("value").as("p_v"))
    // reference: correlated max — latest purchase ts' <= ts per user
    val expected = ev.join(purchases,
        col("user_id") === col("p_uid") && col("p_ts") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("p_v"), col("p_ts")).as("asof_value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val got = ops.TemporalQueries.queries("asof_join")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == expected)
  }
}

class SessionizeSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._

  test("stateful streaming sessionization == batch window sessionization") {
    // batch reference: the sessionize query
    val batch = ops.TemporalQueries.queries("sessionize")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // stateful form over the same data (single-batch replay)
    val streamed = graft.streaming.StreamOps.sessionize(Tables.events(spark, sfDir))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }

  test("sessionization state persists across micro-batches") {
    import org.apache.spark.sql.functions._
    // split the events in event-time halves and drop them as two files:
    // session ids must continue across the batch boundary (GroupState)
    val ev = Tables.events(spark, sfDir)
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5)").collect()(0).getDouble(0).toLong
    val dropDir = java.nio.file.Files.createTempDirectory("graft_sess")
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sess_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst.get
      java.nio.file.Files.move(part, dropDir.resolve(name))
    }
    // normalize to the raw-nanos drop-folder layout readEvents expects,
    // whatever timestamp physical type the testdata parquet carries
    val raw = Tables.events(spark, sfDir)
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val streamIn = graft.streaming.StreamOps.readEvents(spark, dropDir.toString)
    val q = graft.streaming.StreamOps.sessionize(streamIn)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      dump(raw.filter(expr(s"ts div 1000") <= cut), "batch1.parquet")
      q.processAllAvailable()
      val afterFirst = spark.table("sess_out").count()
      assert(afterFirst > 0)
      dump(raw.filter(expr(s"ts div 1000") > cut), "batch2.parquet")
      q.processAllAvailable()
      val streamed = spark.table("sess_out").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
      val batch = ops.TemporalQueries.queries("sessionize")(spark, sfDir)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(streamed.size == batch.size)
      assert(streamed == batch) // ids continued across the batch boundary
    } finally q.stop()
  }
}

class StreamingFunnelSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._

  test("streaming funnel final stages == batch funnel counts (single-batch replay)") {
    import org.apache.spark.sql.functions._
    val batch = ops.TemporalQueries.queries("event_funnel")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sfDir)
    val users = ev.select("user_id").distinct().count()
    val perUser = graft.streaming.StreamOps.streamingFunnel(ev)
      .groupBy("user_id").agg(max(col("stage")).as("stage"))
      .groupBy("stage").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // users that never reach stage 1 emit nothing — they are batch stage 0
    val streamed = perUser + (0 -> (users - perUser.values.sum))
    assert(streamed.filter(_._2 > 0) == batch.filter(_._2 > 0))
  }

  test("funnel emits exactly one row per stage advance, in order") {
    import spark.implicits._
    def ev(u: Long, t: Long, ty: String) =
      (u * 100 + t, new java.sql.Timestamp(t * 1000), u, ty, 1.0, "")
    val rows = Seq(
      ev(1, 1, "view"), ev(1, 2, "click"), ev(1, 3, "click"), ev(1, 4, "purchase"),
      // user 2: click precedes view → capped at stage 1, one emission
      ev(2, 1, "click"), ev(2, 2, "view"), ev(2, 3, "purchase"),
      // user 3: no view → nothing emitted
      ev(3, 1, "click"), ev(3, 2, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.streaming.StreamOps.streamingFunnel(rows).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.filter(_._1 == 1).toSeq.sortBy(_._2) ==
      Seq((1L, 1, 1000000L), (1L, 2, 2000000L), (1L, 3, 4000000L)))
    assert(out.filter(_._1 == 2).toSeq == Seq((2L, 1, 2000000L)))
    assert(!out.exists(_._1 == 3L))
  }

  test("funnel first-touch state persists across micro-batches") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5)").collect()(0).getDouble(0).toLong
    val dropDir = java.nio.file.Files.createTempDirectory("graft_funnel")
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_funnel_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst.get
      java.nio.file.Files.move(part, dropDir.resolve(name))
    }
    val raw = ev.withColumn("ts", expr("unix_micros(ts) * 1000"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val streamIn = graft.streaming.StreamOps.readEvents(spark, dropDir.toString)
    val q = graft.streaming.StreamOps.streamingFunnel(streamIn)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      dump(raw.filter(expr("ts div 1000") <= cut), "batch1.parquet")
      q.processAllAvailable()
      dump(raw.filter(expr("ts div 1000") > cut), "batch2.parquet")
      q.processAllAvailable()
      val perUser = spark.table("funnel_out")
        .groupBy("user_id").agg(max(col("stage")).as("stage"))
        .groupBy("stage").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val users = ev.select("user_id").distinct().count()
      val streamed = perUser + (0 -> (users - perUser.values.sum))
      val batch = ops.TemporalQueries.queries("event_funnel")(spark, sfDir)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(streamed.filter(_._2 > 0) == batch.filter(_._2 > 0))
    } finally q.stop()
  }
}

class StreamingAsofSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._

  private def batchExpected: Map[Long, Option[Double]] =
    ops.TemporalQueries.queries("asof_join")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap

  test("stateful streaming as-of join == batch as-of join (single-batch replay)") {
    val got = graft.streaming.StreamOps.streamingAsofJoin(Tables.events(spark, sfDir))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    val want = batchExpected
    assert(got.size == want.size)
    assert(got == want)
  }

  test("as-of state persists across micro-batches") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5)").collect()(0).getDouble(0).toLong
    val dropDir = java.nio.file.Files.createTempDirectory("graft_asof")
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_asof_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst.get
      java.nio.file.Files.move(part, dropDir.resolve(name))
    }
    val raw = Tables.events(spark, sfDir)
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val q = graft.streaming.StreamOps.streamingAsofJoin(
        graft.streaming.StreamOps.readEvents(spark, dropDir.toString))
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    try {
      dump(raw.filter(expr("ts div 1000") <= cut), "b1.parquet")
      q.processAllAvailable()
      dump(raw.filter(expr("ts div 1000") > cut), "b2.parquet")
      q.processAllAvailable()
      val got = spark.table("asof_out").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
      val want = batchExpected
      assert(got.size == want.size)
      assert(got == want) // carried purchase values crossed the batch boundary
    } finally q.stop()
  }
}

class StreamingMinhashSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._

  test("per-row band signatures == batch minhash band derivation") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val perRow = docs
      .select(col("doc_id"), posexplode(text.TextQueries.bandSigsExpr("text")).as(Seq("band", "sig")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // batch derivation: minhash rows → per-band ordered concat
    val sig = text.TextQueries.queries("dedup_minhash_sig")(spark, sfDir)
    val batch = sig
      .withColumn("band", (col("seed") / lit(4)).cast("int"))
      .groupBy("doc_id", "band")
      .agg(array_join(transform(array_sort(collect_list(struct(col("seed"), col("minh")))),
        x => x.getField("minh").cast("string")), ",").as("sig"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(perRow == batch)
    assert(perRow.nonEmpty)
  }

  test("streaming minhash dedup flags near-dups within horizon, expires state beyond it") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(offsetSec: Long) = new java.sql.Timestamp(t0.getTime + offsetSec * 1000)
    val textX = "the quick brown fox jumps over the lazy dog in the warm summer morning light"
    val textY = "completely different content about distributed query engines and shuffle planning"
    val textZ1 = "first filler document that advances the event time watermark far forward now"
    val textZ2 = "second filler document pushing the watermark so timeouts actually fire here"
    val dropDir = java.nio.file.Files.createTempDirectory("graft_mh")
    import spark.implicits._
    def dump(rows: Seq[(Long, java.sql.Timestamp, String)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_mh_tmp")
      rows.toDF("doc_id", "ts", "text").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst.get
      java.nio.file.Files.move(part, dropDir.resolve(name))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val in = spark.readStream.schema(schema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps
      .streamingMinhashDedup(in, watermark = "10 minutes", horizonMs = 600000L)
      .writeStream.format("memory").queryName("mh_out").outputMode("append").start()
    try {
      // batch 1: A and its near-copy D (same text), unrelated B, and a
      // short doc that must produce no band rows at all
      dump(Seq((1L, ts(0), textX), (2L, ts(0), textY), (4L, ts(60), textX),
        (9L, ts(0), "too short")), "b1.parquet")
      q.processAllAvailable()
      val h1 = spark.table("mh_out").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(h1.keys.count(_._1 == 1L) == 4 && (0 to 3).forall(b => h1((1L, b)) == 1L))
      assert((0 to 3).forall(b => h1((4L, b)) == 1L), "D must be flagged as dup of A on all bands")
      assert((0 to 3).forall(b => h1((2L, b)) == 2L))
      assert(!h1.keys.exists(_._1 == 9L), "short doc has no shingles, no bands")
      // batches 2+3: fillers advance the watermark past the horizon so
      // the timeout sweep evicts batch-1 signatures
      dump(Seq((10L, ts(7200), textZ1)), "b2.parquet")
      q.processAllAvailable()
      dump(Seq((11L, ts(7260), textZ2)), "b3.parquet")
      q.processAllAvailable()
      // batch 4: another copy of textX — state expired, so it registers
      // fresh instead of being flagged against doc 1
      dump(Seq((5L, ts(7320), textX)), "b4.parquet")
      q.processAllAvailable()
      val h4 = spark.table("mh_out").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert((0 to 3).forall(b => h4((5L, b)) == 5L),
        s"state must have expired; got ${(0 to 3).map(b => h4((5L, b)))}")
    } finally q.stop()
  }
}

class StreamingDedupSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._

  test("streaming dedup drops within-watermark duplicates") {
    // drop-folder with the events file twice: every event arrives duplicated
    val dropDir = java.nio.file.Files.createTempDirectory("graft_dedup")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dropDir.resolve("a.parquet"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dropDir.resolve("b.parquet"))
    val deduped = graft.streaming.StreamOps.streamingDedup(
      graft.streaming.StreamOps.readEvents(spark, dropDir.toString), Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = spark.table("dedup_out").count()
      val distinct = Tables.events(spark, sfDir).count()
      assert(n == distinct, s"expected $distinct deduped rows, got $n")
      assert(spark.table("dedup_out").groupBy("event_id").count()
        .filter(col("count") > 1).count() == 0)
    } finally q.stop()
  }
}

class StreamingLshSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._

  private val docSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))

  test("streaming LSH pairs == batch dedup_lsh_pairs on single-batch replay") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val dropDir = java.nio.file.Files.createTempDirectory("graft_lsh_replay")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.withLshStreamConfs(spark) {
      graft.streaming.StreamOps.streamingLshPairs(in)
        .writeStream.format("memory").queryName("lsh_replay").outputMode("append").start()
    }
    try {
      q.processAllAvailable()
      val got = spark.table("lsh_replay").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      val want = SparkEntry.queries("dedup_lsh_pairs")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      assert(want.nonEmpty, "fixture must produce pairs")
      assert(got.keySet == want.keySet,
        s"pair sets differ: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
      // exact inter/uni/jaccard parity (60-bit shingle hashes vs strings)
      want.foreach { case (k, v) => assert(got(k) == v, s"pair $k: ${got(k)} vs $v") }
    } finally q.stop()
  }

  test("streaming LSH pair state expires beyond the horizon") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(offsetSec: Long) = new java.sql.Timestamp(t0.getTime + offsetSec * 1000)
    val near1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val near2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu omicron"
    val fill1 = "totally unrelated filler text to push the watermark forward in stream time"
    val fill2 = "another unrelated filler advancing event time so timeouts fire properly now"
    val dropDir = java.nio.file.Files.createTempDirectory("graft_lsh_exp")
    def dump(rows: Seq[(Long, java.sql.Timestamp, String)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_lsh_tmp")
      rows.toDF("doc_id", "ts", "text").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst.get
      java.nio.file.Files.move(part, dropDir.resolve(name))
    }
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.withLshStreamConfs(spark) {
      graft.streaming.StreamOps
        .streamingLshPairs(in, watermark = "10 minutes", horizonMs = 600000L)
        .writeStream.format("memory").queryName("lsh_exp").outputMode("append").start()
    }
    try {
      // near-identical docs in one horizon -> verified pair
      dump(Seq((1L, ts(0), near1), (2L, ts(60), near2)), "b1.parquet")
      q.processAllAvailable()
      val h1 = spark.table("lsh_exp").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(h1.contains((1L, 2L)), s"expected (1,2) pair, got $h1")
      // advance watermark far past the horizon (two batches so the
      // timeout sweep runs after the watermark has moved)
      dump(Seq((10L, ts(7200), fill1)), "b2.parquet")
      q.processAllAvailable()
      dump(Seq((11L, ts(7260), fill2)), "b3.parquet")
      q.processAllAvailable()
      // a fresh copy of near1: its band signatures re-register instead of
      // pairing against the expired doc 1
      dump(Seq((5L, ts(7320), near1)), "b4.parquet")
      q.processAllAvailable()
      val h4 = spark.table("lsh_exp").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!h4.contains((1L, 5L)) && !h4.contains((2L, 5L)),
        s"state must have expired, got $h4")
      // and a second fresh copy pairs against doc 5 (state is live again)
      dump(Seq((6L, ts(7380), near1)), "b5.parquet")
      q.processAllAvailable()
      val h5 = spark.table("lsh_exp").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(h5.contains((5L, 6L)), s"fresh state must pair, got $h5")
    } finally q.stop()
  }

  test("LSH stream confs are scoped to the query: siblings see session defaults again") {
    import spark.implicits._
    val ck = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val wm = "spark.sql.streaming.multipleWatermarkPolicy"
    // known pre-state: defaults (getOption on a defaulted conf yields
    // the default, so "restored" means these exact values re-read)
    spark.conf.unset(ck)
    spark.conf.set(wm, "min")
    val priorCk = spark.conf.get(ck) // "true" (default)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val dropDir = java.nio.file.Files.createTempDirectory("graft_lsh_scope")
    Seq((1L, t0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.withLshStreamConfs(spark) {
      // inside the scope the required values are in force…
      assert(spark.conf.get(ck) == "false" && spark.conf.get(wm) == "max")
      graft.streaming.StreamOps.streamingLshPairs(in)
        .writeStream.format("memory").queryName("lsh_scope").outputMode("append").start()
    }
    try {
      // …and once the wrapper returns the caller's values are back,
      // while the running query keeps its captured copies
      assert(spark.conf.get(ck) == priorCk, "prior (default) value must be restored")
      assert(spark.conf.get(wm) == "min", "prior value must be restored verbatim")
      q.processAllAvailable() // the LSH query still runs under its captured confs
      // a sibling stateful query started NOW builds under the defaults
      // (pre-fix it silently inherited checkCorrectness=false and max)
      val sibling = graft.streaming.StreamOps.streamingMinhashDedup(
        spark.readStream.schema(docSchema).parquet(dropDir.toString))
        .writeStream.format("memory").queryName("lsh_scope_sibling")
        .outputMode("append").start()
      try sibling.processAllAvailable() finally sibling.stop()
      assert(spark.conf.get(ck) == priorCk && spark.conf.get(wm) == "min")
    } finally {
      q.stop()
      spark.conf.unset(wm)
    }
  }

  test("stream-static incremental dedup == batch lshMatchesAgainst on replay") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batchDocs = all.filter(col("doc_id") % 2 === 1)
    val idx = graft.text.TextQueries.corpusIndex(corpus)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_incr_replay")
    batchDocs.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingLshAgainst(in, idx)
      .writeStream.format("memory").queryName("incr_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("incr_replay").collect()
        .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("dup_of"))
          -> r.getAs[Double]("jaccard")).toMap
      val want = graft.text.TextQueries.lshMatchesAgainst(batchDocs, corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(want.nonEmpty, "fixture must produce incremental matches")
      assert(got.keySet == want.keySet,
        s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
      // exact jaccard parity: hash-array intersection == shingle-join count
      want.foreach { case (k, v) => assert(got(k) == v, s"pair $k: ${got(k)} vs $v") }
      // multi-band collisions must emit once per (batch, corpus) pair
      val raw = spark.table("incr_replay").count()
      assert(raw == got.size, s"duplicate emissions: $raw rows for ${got.size} pairs")
    } finally q.stop()
  }

  test("streaming simhash gate == batch simhashMatchesAgainst on replay") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batchDocs = all.filter(col("doc_id") % 2 === 1)
    val idx = graft.text.TextQueries.simhashIndex(corpus)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_simhash_replay")
    batchDocs.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingSimhashGate(in, idx)
      .writeStream.format("memory").queryName("simhash_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("simhash_replay").collect()
        .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("dup_of"))
          -> r.getAs[Int]("hamming")).toMap
      val want = graft.text.TextQueries.simhashMatchesAgainst(batchDocs, corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(want.nonEmpty, "fixture must produce simhash matches")
      assert(got.keySet == want.keySet,
        s"extra=${(got.keySet -- want.keySet).take(3)} missing=${(want.keySet -- got.keySet).take(3)}")
      // EXACT hamming parity: the per-row HOF fingerprint must be
      // bit-identical to the batch explode+groupBy aggregate
      want.foreach { case (k, v) => assert(got(k) == v, s"pair $k: ${got(k)} vs $v") }
      // multi-band collisions must emit once per (batch, corpus) pair
      val raw = spark.table("simhash_replay").count()
      assert(raw == got.size, s"duplicate emissions: $raw rows for ${got.size} pairs")
    } finally q.stop()
  }

  test("streaming winnow gate == batch winnow matches on replay, fps expr parity") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batchDocs = all.filter(col("doc_id") % 2 === 1)
    // the per-row expression must be bit-identical to the batch frame
    val viaExpr = batchDocs.select(col("doc_id"),
      graft.text.TextQueries.winnowFpsExpr(3, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaFrame = graft.text.TextQueries.winnowIndex(batchDocs)
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    viaFrame.foreach { case (d, fps) =>
      assert(viaExpr(d).toSet == fps && viaExpr(d).size == fps.size, s"doc $d") }
    val idx = graft.text.TextQueries.winnowIndex(corpus)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_winnow_replay")
    batchDocs.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingWinnowGate(in, idx)
      .writeStream.format("memory").queryName("winnow_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("winnow_replay").collect()
        .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("dup_of"))).toSet
      val want = graft.text.TextQueries.winnowDedupAgainst(batchDocs, corpus)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      // the gate emits EVERY matching pair; the batch query keeps the
      // best per batch doc — every batch verdict must appear in the
      // gate's event stream, and shared-fp events dedup to one per pair
      assert(want.nonEmpty, "fixture must produce winnow matches")
      assert(want.forall(got.contains), s"missing ${want.filterNot(got.contains).take(3)}")
      val raw = spark.table("winnow_replay").count()
      assert(raw == got.size, s"duplicate emissions: $raw rows for ${got.size} pairs")
    } finally q.stop()
  }

  test("streaming editdist gate == batch editDistMatchesAgainst on replay") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batchDocs = all.filter(col("doc_id") % 2 === 1)
    val idx = graft.text.TextQueries.winnowIndex(corpus)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_editdist_replay")
    import spark.implicits._
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_editdist_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst.get
      java.nio.file.Files.move(part, dropDir.resolve(name))
    }
    dump(batchDocs.select(col("doc_id"), lit(t0).as("ts"), col("text")), "b1.parquet")
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingEditDistGate(in, idx, corpus)
      .writeStream.format("memory").queryName("editdist_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append-mode aggregation: the per-(doc, candidate) count closes
      // only when the watermark PASSES its event time — push it
      dump(Seq((999999L, java.sql.Timestamp.valueOf("2026-01-01 02:00:00"),
        "sentinel advancing the watermark")).toDF("doc_id", "ts", "text"),
        "b2.parquet")
      q.processAllAvailable()
      val got = spark.table("editdist_replay").collect()
        .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("dup_of"),
          r.getAs[Long]("n_shared"), r.getAs[Long]("dist"),
          r.getAs[Long]("sim_ppm"))).toSet
      val want = graft.text.TextQueries
        .editDistMatchesAgainst(batchDocs, corpus)
        .collect()
        .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("dup_of"),
          r.getAs[Long]("n_shared"), r.getAs[Long]("dist"),
          r.getAs[Long]("sim_ppm"))).toSet
      // bit-identical verdicts: same pairs, same shared counts, same
      // exact distances and integer sim_ppm — and more than one match
      // per doc must be possible (the matches-not-best contract)
      assert(want.nonEmpty, "fixture must produce verified editdist matches")
      assert(got == want,
        s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
      // the batch best-match query is a subset: every best verdict is
      // among the gate's events
      val best = graft.text.TextQueries
        .editDistAgainst(batchDocs, corpus).collect()
        .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("dup_of"))).toSet
      val gotPairs = got.map(t => (t._1, t._2))
      assert(best.forall(gotPairs.contains),
        s"missing best verdicts: ${best.filterNot(gotPairs.contains).take(3)}")
      // a wrong-parameter index (k=4 probe over a k=3 index) is
      // rejected at plan time, not silently recall-zero
      intercept[IllegalArgumentException] {
        graft.streaming.StreamOps.streamingEditDistGate(in, idx, corpus, k = 4)
      }
      // a df-capped index under a gate that expects the exact index
      // (maxDf=0 default) is the same silent-mismatch class
      intercept[IllegalArgumentException] {
        graft.streaming.StreamOps.streamingEditDistGate(in,
          graft.text.TextQueries.winnowIndex(corpus, maxDf = 8), corpus)
      }
    } finally q.stop()
  }

  test("streaming editdist gate over a df-capped index == batch twin at the same cap") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batchDocs = all.filter(col("doc_id") % 2 === 1)
    val idx = graft.text.TextQueries.winnowIndex(corpus, maxDf = 8)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_editdist_dfcap")
    import spark.implicits._
    stageFile(batchDocs.select(col("doc_id"), lit(t0).as("ts"), col("text")),
      dropDir, "b1.parquet")
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps
      .streamingEditDistGate(in, idx, corpus, maxDf = 8)
      .writeStream.format("memory").queryName("editdist_dfcap_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stageFile(Seq((999999L, java.sql.Timestamp.valueOf("2026-01-01 02:00:00"),
        "sentinel advancing the watermark")).toDF("doc_id", "ts", "text"),
        dropDir, "b2.parquet")
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("batch_id"), r.getAs[Long]("dup_of"),
          r.getAs[Long]("n_shared"), r.getAs[Long]("dist"),
          r.getAs[Long]("sim_ppm"))
      val got = spark.table("editdist_dfcap_replay").collect().map(key).toSet
      val want = graft.text.TextQueries
        .editDistMatchesAgainst(batchDocs, corpus, maxDf = 8)
        .collect().map(key).toSet
      assert(want.nonEmpty, "fixture must keep low-df verified matches")
      assert(got == want,
        s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    } finally q.stop()
  }

  test("streaming paragraph gate == batch paragraphDedupAgainst on replay") {
    import graft.text.ParagraphQueries
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpusPages = ParagraphQueries.segmentPages(all.filter(col("doc_id") % 2 === 0))
    val batchPages = ParagraphQueries.segmentPages(all.filter(col("doc_id") % 2 === 1))
    val idx = ParagraphQueries.paragraphIndex(corpusPages)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_para_replay")
    import spark.implicits._
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_para_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst.get
      java.nio.file.Files.move(part, dropDir.resolve(name))
    }
    dump(batchPages.select(col("page_id").as("doc_id"), lit(t0).as("ts"),
      col("text")), "b1.parquet")
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingParagraphGate(in, idx)
      .writeStream.format("memory").queryName("para_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append-mode aggregation: pages close when the watermark passes
      dump(Seq((999999L, java.sql.Timestamp.valueOf("2026-01-01 02:00:00"),
        "sentinel advancing the watermark")).toDF("doc_id", "ts", "text"),
        "b2.parquet")
      q.processAllAvailable()
      val got = spark.table("para_replay").collect()
        .map(r => r.getAs[Long]("batch_id") ->
          (r.getAs[Int]("n_paras"), r.getAs[Int]("n_removed"),
            r.getAs[String]("clean_hash"))).toMap
      val want = ParagraphQueries.paragraphDedupAgainst(batchPages, idx)
        .collect()
        .map(r => r.getAs[Long]("page_id") ->
          (r.getAs[Int]("n_paras"), r.getAs[Int]("n_removed"),
            r.getAs[String]("clean_hash"))).toMap
      // EVERY batch page emits exactly once (zero-match pages included)
      // with bit-identical scrub metrics and clean hash
      assert(want.nonEmpty && want.values.exists(_._2 > 0),
        "fixture must contain corpus-known paragraphs to scrub")
      assert(want.values.exists(_._2 == 0),
        "fixture must also contain zero-match pages")
      assert(got.keySet == want.keySet,
        s"extra=${(got.keySet -- want.keySet).take(3)} missing=${(want.keySet -- got.keySet).take(3)}")
      want.foreach { case (d, v) => assert(got(d) == v, s"page $d: ${got(d)} vs $v") }
    } finally q.stop()
  }

  test("streaming substring scrub gate == batch exactSubstringDedupAgainst on replay") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batchDocs = all.filter(col("doc_id") % 2 === 1)
    val idx = graft.text.TextQueries.substringIndex(corpus)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_sub_replay")
    import spark.implicits._
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sub_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst.get
      java.nio.file.Files.move(part, dropDir.resolve(name))
    }
    dump(batchDocs.select(col("doc_id"), lit(t0).as("ts"), col("text")), "b1.parquet")
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingSubstringGate(in, idx)
      .writeStream.format("memory").queryName("sub_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append-mode aggregation: a group closes only when the watermark
      // PASSES its event time — push it with a far-future sentinel doc
      dump(Seq((999999L, java.sql.Timestamp.valueOf("2026-01-01 02:00:00"),
        "sentinel advancing the watermark")).toDF("doc_id", "ts", "text"),
        "b2.parquet")
      q.processAllAvailable()
      val got = spark.table("sub_replay").collect()
        .map(r => r.getAs[Long]("batch_id") ->
          (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_removed"),
            r.getAs[Int]("n_spans"), r.getAs[String]("clean_hash"))).toMap
      val want = graft.text.TextQueries
        .exactSubstringDedupAgainst(batchDocs, corpus)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_removed"),
            r.getAs[Int]("n_spans"), r.getAs[String]("clean_hash"))).toMap
      // EVERY batch doc emits exactly once (zero-match and short docs
      // included), with bit-identical scrub metrics and clean hash
      assert(want.nonEmpty && want.values.exists(_._2 > 0),
        "fixture must contain scrubbed cross-corpus spans")
      assert(got.keySet == want.keySet,
        s"extra=${(got.keySet -- want.keySet).take(3)} missing=${(want.keySet -- got.keySet).take(3)}")
      want.foreach { case (d, v) => assert(got(d) == v, s"doc $d: ${got(d)} vs $v") }
      // the gate rejects a wrong-window or stripped index at plan time
      intercept[IllegalArgumentException] {
        graft.streaming.StreamOps.streamingSubstringGate(in, idx, k = 30)
      }
    } finally q.stop()
  }

  test("streaming char-substring scrub gate == batch exactSubstringDedupCharsAgainst on replay") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batchDocs = all.filter(col("doc_id") % 2 === 1)
    val idx = graft.text.TextQueries.substringCharsIndex(corpus)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_csub_replay")
    import spark.implicits._
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_csub_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst.get
      java.nio.file.Files.move(part, dropDir.resolve(name))
    }
    dump(batchDocs.select(col("doc_id"), lit(t0).as("ts"), col("text")), "b1.parquet")
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingSubstringCharsGate(in, idx)
      .writeStream.format("memory").queryName("csub_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      dump(Seq((999999L, java.sql.Timestamp.valueOf("2026-01-01 02:00:00"),
        "sentinel advancing the watermark")).toDF("doc_id", "ts", "text"),
        "b2.parquet")
      q.processAllAvailable()
      val got = spark.table("csub_replay").collect()
        .map(r => r.getAs[Long]("batch_id") ->
          (r.getAs[Int]("n_chars"), r.getAs[Int]("n_removed"),
            r.getAs[Int]("n_spans"), r.getAs[String]("clean_hash"))).toMap
      val want = graft.text.TextQueries
        .exactSubstringDedupCharsAgainst(batchDocs, corpus)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Int]("n_chars"), r.getAs[Int]("n_removed"),
            r.getAs[Int]("n_spans"), r.getAs[String]("clean_hash"))).toMap
      assert(want.nonEmpty && want.values.exists(_._2 > 0),
        "fixture must contain scrubbed cross-corpus char spans")
      assert(got.keySet == want.keySet,
        s"extra=${(got.keySet -- want.keySet).take(3)} missing=${(want.keySet -- got.keySet).take(3)}")
      want.foreach { case (d, v) => assert(got(d) == v, s"doc $d: ${got(d)} vs $v") }
      intercept[IllegalArgumentException] {
        graft.streaming.StreamOps.streamingSubstringCharsGate(in, idx, L = 80)
      }
    } finally q.stop()
  }

  test("per-row HOF simhash fingerprint == the batch aggregate on every document") {
    val docs = Tables.documents(spark, sfDir)
    val viaAgg = graft.text.TextQueries.simhashFrameWide(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaRow = docs
      .select(col("doc_id"), expr(graft.text.TextQueries.simhashHashesExpr).as("hs"))
      .select(col("doc_id"), expr(graft.text.TextQueries.simhashWideOfHs).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaRow == viaAgg)
  }

  test("stateless ingest gate == decontamination + quality stages on replay") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val bench = all.filter(col("doc_id") < 10)
    val corpus = all.filter(col("doc_id") >= 10)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_gate_replay")
    corpus.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingIngestGate(in, bench)
      .writeStream.format("memory").queryName("gate_replay").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("gate_replay").collect().map(_.getAs[Long]("doc_id")).toSet
      // expected: decontamination survivors ∩ quality passers, via the
      // independent batch APIs
      val decon = graft.text.TextQueries.decontaminate(corpus, bench)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val quality = graft.text.TextQueries.qualityStats(corpus)
        .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
      val want = decon & quality
      assert(want.nonEmpty && want.size < corpus.count())
      assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    } finally q.stop()
  }

  test("stateless DSIR gate: batch-parity scores, threshold applied per row") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val target = all.filter(col("lang") === "en")
    val dropDir = java.nio.file.Files.createTempDirectory("graft_dsir_replay")
    all.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps
      .streamingDsirGate(in, all, target, minLogw = Double.NegativeInfinity)
      .writeStream.format("memory").queryName("dsir_replay").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dsir_replay").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
      // scoring the training corpus itself through the gate must match
      // the batch weights (same ratio table; fold vs agg order agree
      // after the shared 1e-6 quantization on this fixture)
      val want = graft.text.TextQueries.dsirWeights(all, target)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(got.keySet == want.keySet)
      val off = got.filter { case (id, v) => math.abs(v - want(id)) > 1e-9 }
      assert(off.isEmpty, s"score drift vs batch: ${off.take(5)}")
      // threshold arm: a cutoff at the batch 100th-best weight keeps
      // exactly the batch-side winners (>= on both sides, ties included)
      val cut = want.values.toSeq.sorted(Ordering[Double].reverse)(99)
      val q2 = graft.streaming.StreamOps.streamingDsirGate(in, all, target, minLogw = cut)
        .writeStream.format("memory").queryName("dsir_gate").outputMode("append").start()
      try {
        q2.processAllAvailable()
        val kept = spark.table("dsir_gate").collect().map(_.getAs[Long]("doc_id")).toSet
        val wantKept = want.filter(_._2 >= cut).keySet
        assert(kept == wantKept, s"extra=${kept -- wantKept} missing=${wantKept -- kept}")
        assert(kept.nonEmpty && kept.size < want.size,
          "threshold must keep a strict, non-empty subset on the fixture")
      } finally q2.stop()
    } finally q.stop()
  }

  test("stateless perplexity gate: batch-parity NLL, band filter per row") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_ppl_replay")
    all.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingPerplexityGate(in, all)
      .writeStream.format("memory").queryName("ppl_replay").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ppl_replay").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
      val want = graft.text.TextQueries.unigramScore(all)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(got.keySet == want.keySet)
      // parity holds up to the 1e-6 quantization boundary: fold order
      // (stream) vs partition-order avg (batch) can differ ~1 ulp
      // pre-round, landing a rounding tie one quantum apart
      val off = got.filter { case (id, v) => math.abs(v - want(id)) > 1.001e-6 }
      assert(off.isEmpty, s"NLL drift vs batch: ${off.take(5)}")
      // band arm: keep the middle half by the batch quartiles
      val sorted = want.values.toSeq.sorted
      val (lo, hi) = (sorted(sorted.size / 4), sorted(3 * sorted.size / 4))
      val q2 = graft.streaming.StreamOps.streamingPerplexityGate(in, all, lo, hi)
        .writeStream.format("memory").queryName("ppl_band").outputMode("append").start()
      try {
        q2.processAllAvailable()
        val kept = spark.table("ppl_band").collect().map(_.getAs[Long]("doc_id")).toSet
        val wantKept = want.filter { case (_, v) => v >= lo && v <= hi }.keySet
        assert(kept == wantKept, s"extra=${kept -- wantKept} missing=${wantKept -- kept}")
        assert(kept.nonEmpty && kept.size < want.size)
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming Kneser-Ney gate: batch-parity NLL, band filter per row") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_kn_replay")
    all.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingKnGate(in, all)
      .writeStream.format("memory").queryName("kn_replay").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("kn_replay").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll_kn")).toMap
      val want = graft.text.TextQueries.kneserNeyScore(all)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(want.nonEmpty)
      assert(got.keySet == want.keySet,
        s"extra=${(got.keySet -- want.keySet).take(3)} missing=${(want.keySet -- got.keySet).take(3)}")
      // the unigram gate's fold-order convention: parity up to the
      // 1e-6 quantization boundary
      val off = got.filter { case (id, v) => math.abs(v - want(id)) > 1.001e-6 }
      assert(off.isEmpty, s"KN NLL drift vs batch: ${off.take(5)}")
      // band arm: keep the middle half by the batch quartiles
      val sorted = want.values.toSeq.sorted
      val (lo, hi) = (sorted(sorted.size / 4), sorted(3 * sorted.size / 4))
      val q2 = graft.streaming.StreamOps.streamingKnGate(in, all, lo, hi)
        .writeStream.format("memory").queryName("kn_band").outputMode("append").start()
      try {
        q2.processAllAvailable()
        val kept = spark.table("kn_band").collect().map(_.getAs[Long]("doc_id")).toSet
        val wantKept = want.filter { case (_, v) => v >= lo && v <= hi }.keySet
        assert(kept == wantKept, s"extra=${kept -- wantKept} missing=${wantKept -- kept}")
        assert(kept.nonEmpty && kept.size < want.size)
      } finally q2.stop()
      // a pruned model (topV) still gates: pruned contexts back off
      // through the lambda=1 arm instead of erroring or dropping rows
      val q3 = graft.streaming.StreamOps.streamingKnGate(in, all, topV = Some(64))
        .writeStream.format("memory").queryName("kn_pruned").outputMode("append").start()
      try {
        q3.processAllAvailable()
        val prunedGot = spark.table("kn_pruned").collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll_kn")).toMap
        val prunedWant = graft.text.TextQueries.kneserNeyScore(all, topV = Some(64))
          .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
        assert(prunedGot.keySet == prunedWant.keySet)
        val offP = prunedGot.filter { case (id, v) => math.abs(v - prunedWant(id)) > 1.001e-6 }
        assert(offP.isEmpty, s"pruned KN NLL drift: ${offP.take(5)}")
      } finally q3.stop()
    } finally q.stop()
  }

  test("DSIR gate per-micro-batch plan: cached one-row model, zero shuffles") {
    // the gate's cost model says each micro-batch pays ONE broadcast of
    // the persisted ratio row and a per-row fold — prove it on the
    // executed second-batch plan: the model comes from cache (no
    // recomputation of the counting aggregates), the only join is the
    // one-row broadcast nested loop, and nothing shuffles
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val target = all.filter(col("lang") === "en")
    val dropDir = java.nio.file.Files.createTempDirectory("graft_dsir_plan")
    stageFile(all.filter(col("doc_id") < 250)
      .select(col("doc_id"), lit(t0).as("ts"), col("text")), dropDir, "b0.parquet")
    val q = graft.streaming.StreamOps
      .streamingDsirGate(spark.readStream.schema(docSchema).parquet(dropDir.toString),
        all, target, minLogw = Double.NegativeInfinity)
      .writeStream.format("memory").queryName("dsir_plan").outputMode("append").start()
    try {
      q.processAllAvailable()
      stageFile(all.filter(col("doc_id") >= 250)
        .select(col("doc_id"), lit(t0).as("ts"), col("text")), dropDir, "b1.parquet")
      q.processAllAvailable()
      def expand(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qs: QueryStageExec => Seq(qs.plan)
          case other => other.children
        }
        p +: kids.flatMap(expand)
      }
      val plan = org.apache.spark.sql.GraftBridge.lastBatchPlan(q)
      val nodes = expand(plan)
      assert(nodes.exists(_.isInstanceOf[InMemoryTableScanExec]),
        s"the persisted model row must be served from cache:\n$plan")
      assert(nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) == 1,
        s"expected exactly the one-row model broadcast join:\n$plan")
      assert(!nodes.exists {
        case _: ShuffleExchangeExec | _: ShuffleQueryStageExec => true
        case _ => false
      }, s"a stateless per-row gate must not shuffle the batch:\n$plan")
    } finally q.stop()
  }

  test("stateless Bloom gate: drop set == batch bloomProbe hits, exactly") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val seen = all.filter(col("doc_id") % 2 === 0)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_bloom_replay")
    all.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingBloomGate(in, Some(seen))
      .writeStream.format("memory").queryName("bloom_gate").outputMode("append").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("bloom_gate").collect().map(_.getAs[Long]("doc_id")).toSet
      val wantKept = graft.text.TextQueries
        .bloomProbe(all, graft.text.TextQueries.bloomBuild(seen))
        .filter(!col("bloom_hit")).collect().map(_.getLong(0)).toSet
      assert(kept == wantKept, s"extra=${kept -- wantKept} missing=${wantKept -- kept}")
      // the gate is a dedup filter: every seen doc must be gone, and the
      // fixture must actually pass something through
      val seenIds = seen.select("doc_id").collect().map(_.getLong(0)).toSet
      assert((kept & seenIds).isEmpty, "a seen document leaked through the gate")
      assert(kept.nonEmpty)
    } finally q.stop()
  }

  test("Bloom gate per-micro-batch plan: local one-row dense filter, zero shuffles") {
    import org.apache.spark.sql.execution.{SparkPlan, LocalTableScanExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_bloom_plan")
    stageFile(all.filter(col("doc_id") < 250)
      .select(col("doc_id"), lit(t0).as("ts"), col("text")), dropDir, "b0.parquet")
    val q = graft.streaming.StreamOps
      .streamingBloomGate(spark.readStream.schema(docSchema).parquet(dropDir.toString),
        Some(all.filter(col("doc_id") % 2 === 0)))
      .writeStream.format("memory").queryName("bloom_plan").outputMode("append").start()
    try {
      q.processAllAvailable()
      stageFile(all.filter(col("doc_id") >= 250)
        .select(col("doc_id"), lit(t0).as("ts"), col("text")), dropDir, "b1.parquet")
      q.processAllAvailable()
      def expand(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qs: QueryStageExec => Seq(qs.plan)
          case other => other.children
        }
        p +: kids.flatMap(expand)
      }
      val plan = org.apache.spark.sql.GraftBridge.lastBatchPlan(q)
      val nodes = expand(plan)
      // the dense word-array row is a driver-built LocalRelation — the
      // static side must cost the micro-batch NOTHING beyond its
      // broadcast (no recompute, no cache machinery, no scan of the
      // bits table)
      assert(nodes.exists(_.isInstanceOf[LocalTableScanExec]),
        s"the dense filter row must be a local one-row relation:\n$plan")
      assert(nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) == 1,
        s"expected exactly the one-row filter broadcast join:\n$plan")
      assert(!nodes.exists {
        case _: ShuffleExchangeExec | _: ShuffleQueryStageExec => true
        case _ => false
      }, s"a stateless per-row gate must not shuffle the batch:\n$plan")
    } finally q.stop()
  }

  test("ingest gate with redactPii scrubs spans; parity with the batch redaction") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val bench = all.filter(col("doc_id") < 10)
    // plant a PII span on every third corpus doc so the scrub is
    // exercised on known ground truth
    val corpus = all.filter(col("doc_id") >= 10)
      .withColumn("text",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com via 10.1.2.3")))
          .otherwise(col("text")))
    val dropDir = java.nio.file.Files.createTempDirectory("graft_pii_replay")
    corpus.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingIngestGate(in, bench, redactPii = true)
      .writeStream.format("memory").queryName("pii_replay").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("pii_replay").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
      // batch expectation: same gate stages, then the batch redaction
      val want = graft.streaming.StreamOps
        .streamingIngestGate(corpus.select(col("doc_id"), lit(t0).as("ts"), col("text")), bench)
        .withColumn("text", graft.text.PiiQueries.redactPii(col("text")))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
      assert(got == want)
      val planted = got.filter { case (id, _) => id % 3 == 0 }
      assert(planted.nonEmpty, "fixture must keep some planted docs")
      planted.foreach { case (id, text) =>
        assert(text.contains("<EMAIL>") && text.contains("<IP>"), s"doc $id: $text")
        assert(!text.contains("@example.com") && !text.contains("10.1.2.3"))
      }
    } finally q.stop()
  }

  test("stream-static ANN gate == identical batch plan on replay") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.embeddings(spark, sfDir)
    val cents = graft.sim.Ivf.trainCentroids(spark, sfDir, 8)
    val corpus = graft.sim.Ivf.withCell(all.filter(col("vec_id") % 2 === 0), cents)
    val batchVecs = all.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), lit(t0).as("ts"), col("embedding"))
    val dropDir = java.nio.file.Files.createTempDirectory("graft_ann_replay")
    batchVecs.coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val embSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("embedding", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))))
    val in = spark.readStream.schema(embSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingAnnAgainst(in, corpus, cents, threshold = 0.1)
      .writeStream.format("memory").queryName("ann_replay").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ann_replay").collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("dup_of"))
          -> r.getAs[Double]("cosine")).toMap
      // the gate is stateless, so the SAME function over the batch frame
      // is the exact expected result — replay pins streaming execution
      val want = graft.streaming.StreamOps
        .streamingAnnAgainst(batchVecs, corpus, cents, threshold = 0.1)
        .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
      assert(want.nonEmpty, "fixture must produce same-cell matches")
      assert(got.keySet == want.keySet,
        s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
      want.foreach { case (k, v) => assert(got(k) == v, s"pair $k: ${got(k)} vs $v") }
    } finally q.stop()
  }

  test("multi-probe streaming ANN gate widens recall, emits each pair once") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.embeddings(spark, sfDir)
    val cents = graft.sim.Ivf.trainCentroids(spark, sfDir, 8)
    val corpus = graft.sim.Ivf.withCell(all.filter(col("vec_id") % 2 === 0), cents)
    val batchVecs = all.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), lit(t0).as("ts"), col("embedding"))
    val dropDir = java.nio.file.Files.createTempDirectory("graft_ann_p2_replay")
    batchVecs.coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val embSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("embedding", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))))
    val in = spark.readStream.schema(embSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps
      .streamingAnnAgainst(in, corpus, cents, threshold = 0.1, nprobe = 2)
      .writeStream.format("memory").queryName("ann_p2_replay").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ann_p2_replay").collect()
      val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("dup_of"))
        -> r.getAs[Double]("cosine")).toMap
      // a corpus vector lives in one cell, so multi-probe must never
      // emit the same pair twice
      assert(rows.length == got.size, s"duplicate emissions: ${rows.length} vs ${got.size}")
      // stateless ⇒ the same function over the batch frame is exact
      val want = graft.streaming.StreamOps
        .streamingAnnAgainst(batchVecs, corpus, cents, threshold = 0.1, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
      assert(got.keySet == want.keySet,
        s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
      want.foreach { case (k, v) => assert(got(k) == v, s"pair $k: ${got(k)} vs $v") }
      // probing the second-nearest cell can only ADD matches
      val p1 = graft.streaming.StreamOps
        .streamingAnnAgainst(batchVecs, corpus, cents, threshold = 0.1)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(p1.subsetOf(got.keySet), "nprobe=2 must contain every nprobe=1 match")
      assert(got.keySet != p1, "fixture must gain at least one neighbor-cell match")
    } finally q.stop()
  }

  test("composed curation gate: survivors = quality ∩ decon ∩ DSIR ∩ perplexity, scores parity") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val bench = all.filter(col("doc_id") < 10)
    val corpus = all.filter(col("doc_id") >= 10)
    val target = corpus.filter(col("lang") === "en")
    val dropDir = java.nio.file.Files.createTempDirectory("graft_cur_replay")
    corpus.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    // thresholds from the batch sides so every stage actually filters:
    // DSIR median, perplexity middle band
    val wantW = graft.text.TextQueries.dsirWeights(corpus, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val wantN = graft.text.TextQueries.unigramScore(corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val wSorted = wantW.values.toSeq.sorted
    val nSorted = wantN.values.toSeq.sorted
    val cutW = wSorted(wSorted.size / 2)
    val (loN, hiN) = (nSorted(nSorted.size / 4), nSorted(3 * nSorted.size / 4))
    val q = graft.streaming.StreamOps.streamingCurationGate(
      in, bench, corpus, target, corpus,
      minLogw = cutW, minNll = loN, maxNll = hiN)
      .writeStream.format("memory").queryName("cur_replay").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cur_replay").collect()
      val got = rows.map(r => r.getAs[Long]("doc_id")
        -> ((r.getAs[Double]("logw"), r.getAs[Double]("nll")))).toMap
      // expected survivors: the four INDEPENDENT batch stages intersected
      val quality = graft.text.TextQueries.qualityStats(corpus)
        .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
      val decon = graft.text.TextQueries.decontaminate(corpus, bench)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val dsirKeep = wantW.filter(_._2 >= cutW).keySet
      val pplKeep = wantN.filter { case (_, v) => v >= loN && v <= hiN }.keySet
      val want = quality & decon & dsirKeep & pplKeep
      assert(want.nonEmpty && want.size < corpus.count(),
        "fixture must keep a strict, non-empty subset")
      // each stage must bite on its own (or the composition proves nothing)
      val nCorpus = corpus.count()
      for ((nm, s) <- Seq("quality" -> quality, "decon" -> decon,
          "dsir" -> dsirKeep, "ppl" -> pplKeep))
        assert(s.size < nCorpus, s"stage $nm filters nothing on the fixture")
      assert(got.keySet == want, s"extra=${got.keySet -- want} missing=${want -- got.keySet}")
      // score parity: logw exact (shared fold + quantization), nll up to
      // the 1e-6 quantization boundary (fold vs partition-order avg)
      val offW = got.filter { case (id, (w, _)) => math.abs(w - wantW(id)) > 1e-9 }
      assert(offW.isEmpty, s"logw drift: ${offW.take(5)}")
      val offN = got.filter { case (id, (_, v)) => math.abs(v - wantN(id)) > 1.001e-6 }
      assert(offN.isEmpty, s"nll drift: ${offN.take(5)}")
    } finally q.stop()
  }

  test("curation gate with classifier stage: prob parity, threshold bites, survivors compose") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val bench = all.filter(col("doc_id") < 10)
    val corpus = all.filter(col("doc_id") >= 10)
    val target = corpus.filter(col("lang") === "en")
    val (bias, w) = graft.text.TextQueries.qualityClassifierTrain(
      corpus, col("lang") === "en", buckets = 256)
    val wantP = graft.text.TextQueries.qualityClassifierScore(corpus, bias, w)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val pSorted = wantP.values.toSeq.sorted
    val cutP = pSorted(pSorted.size / 2)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_cur_cls")
    corpus.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingCurationGate(
      in, bench, corpus, target, corpus,
      minLogw = Double.NegativeInfinity, minNll = Double.MinValue,
      classifier = Some((bias, w)), minProb = cutP)
      .writeStream.format("memory").queryName("cur_cls").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cur_cls").collect()
      val got = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_prob")).toMap
      // survivors: quality ∩ decon ∩ {prob >= cut} (DSIR/nll bands open)
      val quality = graft.text.TextQueries.qualityStats(corpus)
        .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
      val decon = graft.text.TextQueries.decontaminate(corpus, bench)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // the per-row fold can land one 1e-6 quantum away from the batch
      // prob, so judge the threshold against the STREAM's own score
      val want = (quality & decon).filter(id => got.get(id).exists(_ >= cutP) ||
        (!got.contains(id) && wantP(id) < cutP + 1.1e-6))
      assert(got.keySet.subsetOf(quality & decon))
      val offP = got.filter { case (id, p) => math.abs(p - wantP(id)) > 1.001e-6 }
      assert(offP.isEmpty, s"prob drift vs batch: ${offP.take(5)}")
      assert(got.nonEmpty && got.size < (quality & decon).size,
        "the classifier threshold must bite on the fixture")
      // every confidently-above-cut doc must survive, every
      // confidently-below-cut doc must be dropped
      for (id <- quality & decon) {
        if (wantP(id) >= cutP + 1.1e-6) assert(got.contains(id), s"doc $id wrongly dropped")
        if (wantP(id) < cutP - 1.1e-6) assert(!got.contains(id), s"doc $id wrongly kept")
      }
    } finally q.stop()
  }

  test("composed curation gate per-micro-batch plan: ONE one-row broadcast, zero shuffles") {
    // the whole point of the composition: four stages (+ the classifier
    // stage), still exactly one broadcast join of one cached static
    // row, and no shuffle of the micro-batch — pinned on the executed
    // second-batch plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val bench = all.filter(col("doc_id") < 10)
    val corpus = all.filter(col("doc_id") >= 10)
    val target = corpus.filter(col("lang") === "en")
    val dropDir = java.nio.file.Files.createTempDirectory("graft_cur_plan")
    stageFile(corpus.filter(col("doc_id") < 250)
      .select(col("doc_id"), lit(t0).as("ts"), col("text")), dropDir, "b0.parquet")
    val (qcBias, qcW) = graft.text.TextQueries.qualityClassifierTrain(
      corpus, col("lang") === "en", buckets = 64, iters = 5)
    val q = graft.streaming.StreamOps.streamingCurationGate(
      spark.readStream.schema(docSchema).parquet(dropDir.toString),
      bench, corpus, target, corpus,
      minLogw = Double.NegativeInfinity, minNll = Double.MinValue,
      classifier = Some((qcBias, qcW)))
      .writeStream.format("memory").queryName("cur_plan").outputMode("append").start()
    try {
      q.processAllAvailable()
      stageFile(corpus.filter(col("doc_id") >= 250)
        .select(col("doc_id"), lit(t0).as("ts"), col("text")), dropDir, "b1.parquet")
      q.processAllAvailable()
      def expand(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qs: QueryStageExec => Seq(qs.plan)
          case other => other.children
        }
        p +: kids.flatMap(expand)
      }
      val plan = org.apache.spark.sql.GraftBridge.lastBatchPlan(q)
      val nodes = expand(plan)
      assert(nodes.exists(_.isInstanceOf[InMemoryTableScanExec]),
        s"the composed static row must be served from cache:\n$plan")
      assert(nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) == 1,
        s"four stages must still pay exactly ONE one-row broadcast join:\n$plan")
      assert(!nodes.exists {
        case _: ShuffleExchangeExec | _: ShuffleQueryStageExec => true
        case _ => false
      }, s"a stateless per-row gate must not shuffle the batch:\n$plan")
    } finally q.stop()
  }

  test("curation gate compression stage: exact deflate parity, threshold bites") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val bench = all.filter(col("doc_id") < 10)
    val corpus = all.filter(col("doc_id") >= 10)
    val target = corpus.filter(col("lang") === "en")
    val wantR = graft.text.TextQueries.compressionRatio(corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val rSorted = wantR.values.toSeq.sorted
    val cutR = rSorted(rSorted.size / 2)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_cur_cmp")
    corpus.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingCurationGate(
      spark.readStream.schema(docSchema).parquet(dropDir.toString),
      bench, corpus, target, corpus,
      minLogw = Double.NegativeInfinity, minNll = Double.MinValue,
      maxCompressRatio = Some(cutR))
      .writeStream.format("memory").queryName("cur_cmp").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cur_cmp").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      val quality = graft.text.TextQueries.qualityStats(corpus)
        .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
      val decon = graft.text.TextQueries.decontaminate(corpus, bench)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // deflate is deterministic within one JVM -> EXACT parity, no
      // quantization band needed (unlike the float-scored stages)
      val cmpKeep = wantR.filter(_._2 <= cutR).keySet
      val want = quality & decon & cmpKeep
      assert(cmpKeep.size < corpus.count(),
        "the compression threshold must filter something on the fixture")
      assert(want.nonEmpty && got == want,
        s"extra=${got -- want} missing=${want -- got}")
    } finally q.stop()
  }

  test("curation gate alphabetic-ratio stage: exact batch parity, threshold bites") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val bench = all.filter(col("doc_id") < 10)
    val corpus = all.filter(col("doc_id") >= 10)
    val target = corpus.filter(col("lang") === "en")
    val wantPpm = graft.text.TextQueries.charClassProfile(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sorted = wantPpm.values.toSeq.sorted
    val cut = sorted(sorted.size / 2)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_cur_alpha")
    corpus.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingCurationGate(
      spark.readStream.schema(docSchema).parquet(dropDir.toString),
      bench, corpus, target, corpus,
      minLogw = Double.NegativeInfinity, minNll = Double.MinValue,
      minLetterPpm = Some(cut))
      .writeStream.format("memory").queryName("cur_alpha").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cur_alpha").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      val quality = graft.text.TextQueries.qualityStats(corpus)
        .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
      val decon = graft.text.TextQueries.decontaminate(corpus, bench)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // the ppm share is integer arithmetic -> EXACT parity with the
      // batch charClassProfile letter_ppm
      val alphaKeep = wantPpm.filter(_._2 >= cut).keySet
      val want = quality & decon & alphaKeep
      assert(alphaKeep.size < corpus.count(),
        "the alphabetic threshold must filter something on the fixture")
      assert(want.nonEmpty && got == want,
        s"extra=${got -- want} missing=${want -- got}")
    } finally q.stop()
  }

  test("curation gate: alphabetic + outlier-fence stages COMPOSE (both filters bite)") {
    // pins the stage-chain wiring: the first cut of the fence stage
    // built from the pre-alphabetic frame, silently dropping
    // minLetterPpm whenever both knobs were set (review finding)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val bench = all.filter(col("doc_id") < 10)
    val corpus = all.filter(col("doc_id") >= 10)
    val target = corpus.filter(col("lang") === "en")
    val wantPpm = graft.text.TextQueries.charClassProfile(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sorted = wantPpm.values.toSeq.sorted
    val cut = sorted(sorted.size / 2)
    val fences = {
      graft.text.TextQueries.qualityOutliers(corpus).count() // train fences
      graft.text.TextQueries.cachedOutlierFences.get
    }
    val fenceKeep = graft.text.TextQueries.qualityOutliers(corpus)
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    val dropDir = java.nio.file.Files.createTempDirectory("graft_cur_combo")
    corpus.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingCurationGate(
      spark.readStream.schema(docSchema).parquet(dropDir.toString),
      bench, corpus, target, corpus,
      minLogw = Double.NegativeInfinity, minNll = Double.MinValue,
      minLetterPpm = Some(cut), outlierFences = Some(fences))
      .writeStream.format("memory").queryName("cur_combo").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cur_combo").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      val quality = graft.text.TextQueries.qualityStats(corpus)
        .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
      val decon = graft.text.TextQueries.decontaminate(corpus, bench)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val alphaKeep = wantPpm.filter(_._2 >= cut).keySet
      val want = quality & decon & alphaKeep & fenceKeep
      assert(alphaKeep.size < corpus.count(), "alpha threshold must bite")
      assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    } finally q.stop()
  }

  test("curation gate blocklist stage: exact batch parity, phrases bite") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val bench = all.filter(col("doc_id") < 10)
    val corpus = all.filter(col("doc_id") >= 10)
    val target = corpus.filter(col("lang") === "en")
    val phrases = Seq("dup", "slow query")
    val blKeep = graft.text.TextQueries.blocklistFilter(corpus, phrases)
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    val dropDir = java.nio.file.Files.createTempDirectory("graft_cur_bl")
    corpus.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingCurationGate(
      spark.readStream.schema(docSchema).parquet(dropDir.toString),
      bench, corpus, target, corpus,
      minLogw = Double.NegativeInfinity, minNll = Double.MinValue,
      blocklist = Some(phrases))
      .writeStream.format("memory").queryName("cur_bl").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cur_bl").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      val quality = graft.text.TextQueries.qualityStats(corpus)
        .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
      val decon = graft.text.TextQueries.decontaminate(corpus, bench)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // automaton hit counts are integers -> EXACT parity with the
      // batch keep verdict, no quantization band
      val want = quality & decon & blKeep
      assert(blKeep.size < corpus.count(),
        "the blocklist must filter something on the fixture")
      assert(want.nonEmpty && got == want,
        s"extra=${got -- want} missing=${want -- got}")
    } finally q.stop()
  }

  test("curation gate outlier stage: literal fences match the batch verdict") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val bench = all.filter(col("doc_id") < 10)
    val corpus = all.filter(col("doc_id") >= 10)
    val target = corpus.filter(col("lang") === "en")
    // batch run computes the fences AND the reference keep verdicts
    val outRows = graft.text.TextQueries.qualityOutliers(corpus).collect()
    val fenceKeep = outRows.filter(_.getBoolean(5)).map(_.getLong(0)).toSet
    val fences = graft.text.TextQueries.cachedOutlierFences.get
    val dropDir = java.nio.file.Files.createTempDirectory("graft_cur_out")
    corpus.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingCurationGate(
      spark.readStream.schema(docSchema).parquet(dropDir.toString),
      bench, corpus, target, corpus,
      minLogw = Double.NegativeInfinity, minNll = Double.MinValue,
      outlierFences = Some(fences))
      .writeStream.format("memory").queryName("cur_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cur_out").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      val quality = graft.text.TextQueries.qualityStats(corpus)
        .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
      val decon = graft.text.TextQueries.decontaminate(corpus, bench)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // integer token counts and the SAME round-6 mean expression →
      // exact parity with the batch kept verdict
      val want = quality & decon & fenceKeep
      assert(fenceKeep.size < corpus.count(),
        "the fences must trim something on the fixture")
      assert(want.nonEmpty && got == want,
        s"extra=${got -- want} missing=${want -- got}")
    } finally q.stop()
  }

  /** Stage `df` as one more file into a streaming drop-folder (file
    * sources monitor directories; each new file is the next batch). */
  private def stageFile(df: org.apache.spark.sql.DataFrame,
                        dropDir: java.nio.file.Path, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp)
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst.get
    java.nio.file.Files.copy(part, dropDir.resolve(name))
  }

  test("bucketed IVF index keeps the per-micro-batch ANN join shuffle-free on the static side") {
    // the ANN twin of the LSH bucketed-index proof below: persist the
    // cell-assigned corpus bucketed by `cell`, drive TWO micro-batches
    // with broadcast disabled, and pin the executed plan — the static
    // side must be a bucketed scan (SelectedBucketsCount) with ZERO
    // Exchange; only the micro-batch's own vectors re-cluster.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.embeddings(spark, sfDir)
    val cents = graft.sim.Ivf.trainCentroids(spark, sfDir, 8)
    val corpus = graft.sim.Ivf.withCell(all.filter(col("vec_id") % 2 === 0), cents)
    val batchVecs = all.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), lit(t0).as("ts"), col("embedding"))
    val embSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("embedding", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))))
    val idxDir = java.nio.file.Files.createTempDirectory("graft_ann_idx")
    spark.sql("DROP TABLE IF EXISTS ann_idx_bucketed")
    corpus.write.bucketBy(4, "cell").sortBy("cell")
      .option("path", idxDir.resolve("idx").toString)
      .saveAsTable("ann_idx_bucketed")
    val idx = spark.table("ann_idx_bucketed")
    val dropDir = java.nio.file.Files.createTempDirectory("graft_ann_bucket_replay")
    stageFile(batchVecs.filter(col("vec_id") < 250), dropDir, "b0.parquet")
    val bt = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(bt)
    spark.conf.set(bt, "-1")
    val q = graft.streaming.StreamOps.streamingAnnAgainst(
      spark.readStream.schema(embSchema).parquet(dropDir.toString), idx, cents)
      .writeStream.format("memory").queryName("ann_bucket_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.conf.set(bt, prior)
      stageFile(batchVecs.filter(col("vec_id") >= 250), dropDir, "b1.parquet")
      q.processAllAvailable()
      // this batch plan runs under AQE, whose wrapper nodes
      // (AdaptiveSparkPlanExec, Shuffle/ResultQueryStageExec) are
      // LEAVES to TreeNode.collect — expand through them explicitly
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
      def expand(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qs: QueryStageExec => Seq(qs.plan)
          case other => other.children
        }
        p +: kids.flatMap(expand)
      }
      // a ShuffleQueryStage IS a shuffle (it wraps the Exchange)
      def shuffles(p: SparkPlan): Seq[SparkPlan] = expand(p).filter {
        case _: ShuffleExchangeExec | _: ShuffleQueryStageExec => true
        case _ => false
      }
      val plan = org.apache.spark.sql.GraftBridge.lastBatchPlan(q)
      val joins = expand(plan).filter {
        case _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
        case _ => false
      }
      assert(joins.size == 1, s"expected one shuffle-family join:\n$plan")
      val Seq(left, right) = joins.head.children
      val (static, stream) =
        if (left.toString.contains("SelectedBucketsCount")) (left, right) else (right, left)
      assert(static.toString.contains("SelectedBucketsCount"),
        s"static side must be a BUCKETED scan:\n$plan")
      assert(shuffles(static).isEmpty,
        s"static side must never shuffle:\n$static")
      assert(shuffles(stream).nonEmpty,
        s"expected the stream side to shuffle to the bucket layout:\n$stream")
      // and the two-batch answer equals the same gate run as ONE batch
      val got = spark.table("ann_bucket_replay").collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("dup_of"))
          -> r.getAs[Double]("cosine")).toMap
      val want = graft.streaming.StreamOps
        .streamingAnnAgainst(batchVecs, corpus, cents)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("dup_of")) -> r.getAs[Double]("cosine")).toMap
      assert(want.nonEmpty, "fixture must produce ANN matches")
      assert(got == want,
        s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
    } finally {
      q.stop()
      spark.conf.set(bt, prior)
      spark.sql("DROP TABLE IF EXISTS ann_idx_bucketed")
    }
  }

  test("bucketed corpus index keeps the per-micro-batch join shuffle-free on the static side") {
    // StreamOps.streamingLshAgainst's scaladoc claims bucketing the
    // persisted index by (band, sig) makes the per-batch join entirely
    // shuffle-free on the corpus side — prove it: persist the index
    // bucketed, drive TWO micro-batches, and pin the second batch's
    // executed plan (broadcast disabled so the join can't hide the
    // distribution requirement).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batchDocs = all.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), lit(t0).as("ts"), col("text"))
    val idxDir = java.nio.file.Files.createTempDirectory("graft_bucket_idx")
    spark.sql("DROP TABLE IF EXISTS corpus_idx_bucketed")
    graft.text.TextQueries.corpusIndex(corpus).write
      .bucketBy(4, "band", "sig").sortBy("band", "sig")
      .option("path", idxDir.resolve("idx").toString)
      .saveAsTable("corpus_idx_bucketed")
    val idx = spark.table("corpus_idx_bucketed")
    val dropDir = java.nio.file.Files.createTempDirectory("graft_bucket_replay")
    stageFile(batchDocs.filter(col("doc_id") < 500), dropDir, "b0.parquet")
    // scope the no-broadcast conf like withLshStreamConfs: restore only
    // after the first batch resolves (the query keeps its captured copy)
    val bt = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(bt)
    spark.conf.set(bt, "-1")
    val q = graft.streaming.StreamOps.streamingLshAgainst(
      spark.readStream.schema(docSchema).parquet(dropDir.toString), idx)
      .writeStream.format("memory").queryName("bucket_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.conf.set(bt, prior)
      stageFile(batchDocs.filter(col("doc_id") >= 500), dropDir, "b1.parquet")
      q.processAllAvailable()
      val plan = org.apache.spark.sql.GraftBridge.lastBatchPlan(q)
      val joins = plan.collect {
        case j: SortMergeJoinExec => j: SparkPlan
        case j: ShuffledHashJoinExec => j: SparkPlan
      }
      assert(joins.size == 1, s"expected one shuffle-family join:\n$plan")
      val Seq(left, right) = joins.head.children
      // the static side is the one reading the index's `hashes` column
      val (static, stream) =
        if (left.toString.contains("hashes")) (left, right) else (right, left)
      assert(static.toString.contains("hashes"), s"no index side found:\n$plan")
      assert(static.toString.contains("SelectedBucketsCount"),
        s"static side must be a BUCKETED scan:\n$static")
      assert(static.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"static side must never shuffle:\n$static")
      // only the micro-batch's own (small) exploded band rows move: the
      // stream side re-clusters to the index's bucket layout
      assert(stream.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
        s"expected the stream side to shuffle to the bucket layout:\n$stream")
      // and the answer over both batches is the batch API's, exactly
      val got = spark.table("bucket_replay").collect()
        .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("dup_of"))
          -> r.getAs[Double]("jaccard")).toMap
      val want = graft.text.TextQueries
        .lshMatchesAgainst(batchDocs, corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(want.nonEmpty, "fixture must produce incremental matches")
      assert(got == want,
        s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
    } finally {
      q.stop()
      spark.conf.set(bt, prior)
      spark.sql("DROP TABLE IF EXISTS corpus_idx_bucketed")
    }
  }

  test("streaming HLL sketch: overlay onto the corpus index == full-batch registers") {
    import graft.ops.Sketches
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batch = all.filter(col("doc_id") % 2 === 1)
    def words(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(split(col("text"), " ")).as("w"))
    val corpusIdx = Sketches.hllRegisters(words(corpus), col("w"))
      .localCheckpoint()
    val dropDir = java.nio.file.Files.createTempDirectory("graft_sketch_stream")
    batch.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingDistinctSketch(in, Some(corpusIdx))
      .writeStream.format("memory").queryName("sketch_mon").outputMode("update").start()
    try {
      q.processAllAvailable()
      val upserts = spark.table("sketch_mon").collect()
        .map(r => r.getInt(0) -> r.getInt(1)).groupBy(_._1)
        .map { case (b, rs) => b -> rs.map(_._2).max } // update mode may emit a bucket per batch
      val idx = corpusIdx.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      // the incremental-index contract: updates overlay the persisted rows
      val overlaid = (idx.keySet ++ upserts.keySet).map { b =>
        b -> math.max(upserts.getOrElse(b, 0), idx.getOrElse(b, 0))
      }.toMap
      val full = Sketches.hllRegisters(words(all), col("w")).collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(overlaid == full,
        s"diff=${(overlaid.toSet diff full.toSet) ++ (full.toSet diff overlaid.toSet)}")
      // every upsert already incorporates history (rank maxed pre-aggregate)
      upserts.foreach { case (b, r) =>
        assert(r >= idx.getOrElse(b, 0), s"upsert for bucket $b below the index")
      }
    } finally q.stop()
  }

  test("streaming exact-Jaccard gate: verdict pairs == batch jaccardJoinAgainst") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batchDocs = all.filter(col("doc_id") % 2 === 1)
    // the gate needs the HASH-ORDERED index (its per-row prefix is a
    // pure expression) plus the doc-id-keyed verification side; batch
    // parity holds because recall 1 under any common total order makes
    // the order private to the plan
    val idx = graft.text.TextQueries.jaccardIndex(corpus,
      threshold = 0.8, hashOrdered = true)
    val side = graft.text.TextQueries.docHashSide(corpus)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_jgate")
    batchDocs.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingJaccardGate(in, idx, side, threshold = 0.8)
      .writeStream.format("memory").queryName("jgate").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("jgate").select("batch_id", "dup_of").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = graft.text.TextQueries
        .jaccardJoinAgainst(batchDocs, corpus, threshold = 0.8)
        .select("batch_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty, "fixture must contain cross-split pairs at 0.8")
      assert(got == want, s"gate verdicts must equal the batch join: " +
        s"missing=${(want diff got).take(5)} extra=${(got diff want).take(5)}")
    } finally q.stop()
  }

  test("streaming containment gate: verdicts == brute-force contained-in-corpus pairs") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batchDocs = all.filter(col("doc_id") % 2 === 1)
    // FULL-token index: only the incoming (contained) side's prefix may
    // shorten — a prefix-indexed corpus would be a recall hole
    val idx = graft.text.TextQueries.containIndex(corpus)
    val side = graft.text.TextQueries.docHashSide(corpus)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_cgate")
    batchDocs.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingContainGate(in, idx, side, threshold = 0.8)
      .writeStream.format("memory").queryName("cgate").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cgate").select("batch_id", "dup_of").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def sh(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
        explode(graft.text.TextQueries.ngramShinglesExpr("text", 3)).as("s"))
      val want = sh(batchDocs).as("b").join(sh(corpus).as("c"), col("b.s") === col("c.s"))
        .groupBy(col("b.doc_id").as("batch_id"), col("c.doc_id").as("dup_of"))
        .agg(count(lit(1)).as("inter"))
        .join(sh(batchDocs).groupBy("doc_id").agg(count(lit(1)).as("bn")),
          col("batch_id") === col("doc_id")).drop("doc_id")
        .filter(col("inter") * lit(1000000L) >= lit(800000L) * col("bn"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty, "fixture must contain contained-in-corpus pairs at 0.8")
      assert(got == want, s"gate verdicts must equal the brute force: " +
        s"missing=${(want diff got).take(5)} extra=${(got diff want).take(5)}")
    } finally q.stop()
  }

  test("containment gate over BUCKETED catalog tables == in-memory index path") {
    // the production deployment: writeContainIndexTables persists the
    // full-token index + doc side as bucketed tables, the gate does
    // stream-static joins against spark.table(...) — verdicts must
    // equal the in-memory index path, the compatibility stamps must
    // survive the catalog (a wrong-kind/wrong-hash table still fails
    // at plan time), and a jaccard-prefix table must be rejected
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batchDocs = all.filter(col("doc_id") % 2 === 1)
    try {
      graft.text.TextQueries.writeContainIndexTables(corpus, "cgate_t", buckets = 4)
      graft.text.TextQueries.writeJaccardIndexTables(corpus, "jgate_t",
        threshold = 0.8, buckets = 4, hashOrdered = true)
      val dropDir = java.nio.file.Files.createTempDirectory("graft_cgate_b")
      batchDocs.select(col("doc_id"), lit(t0).as("ts"), col("text"))
        .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
      val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
      // wrong-kind rejection straight off the catalog
      intercept[IllegalArgumentException] {
        graft.streaming.StreamOps.streamingContainGate(in,
          spark.table("jgate_t_idx"), spark.table("cgate_t_side"), threshold = 0.8)
      }
      val q = graft.streaming.StreamOps.streamingContainGate(in,
          spark.table("cgate_t_idx"), spark.table("cgate_t_side"), threshold = 0.8)
        .writeStream.format("memory").queryName("cgate_b").outputMode("append").start()
      val got = try {
        q.processAllAvailable()
        spark.table("cgate_b").select("batch_id", "dup_of").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally q.stop()
      val want = graft.text.TextQueries
        .containJoinAgainst(batchDocs, corpus, threshold = 0.8)
        .select("batch_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty && got == want,
        s"bucketed-table gate must equal the batch twin: " +
          s"missing=${(want diff got).take(5)} extra=${(got diff want).take(5)}")
    } finally Seq("cgate_t_idx", "cgate_t_side", "jgate_t_df", "jgate_t_idx",
      "jgate_t_side").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming CountMin sketch: additive overlay onto the index == full counters") {
    import graft.ops.Sketches
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batch = all.filter(col("doc_id") % 2 === 1)
    def words(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(split(col("text"), " ")).as("w"))
    def snap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val idx = snap(Sketches.cmCounters(words(corpus), col("w")))
    val dropDir = java.nio.file.Files.createTempDirectory("graft_cm_stream")
    batch.select(col("doc_id"), lit(t0).as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(dropDir.toString)
    val in = spark.readStream.schema(docSchema).parquet(dropDir.toString)
    val q = graft.streaming.StreamOps.streamingFreqSketch(in)
      .writeStream.format("memory").queryName("cm_mon").outputMode("update").start()
    try {
      q.processAllAvailable()
      // update mode re-emits a touched cell per batch with its
      // CUMULATIVE stream count — the latest (= max, counts only grow)
      // value per cell is the overlay operand
      val upserts = spark.table("cm_mon").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).groupBy(_._1)
        .map { case (cell, rs) => cell -> rs.map(_._2).max }
      val overlaid = (idx.keySet ++ upserts.keySet).map { cell =>
        cell -> (idx.getOrElse(cell, 0L) + upserts.getOrElse(cell, 0L))
      }.toMap
      val full = snap(Sketches.cmCounters(words(all), col("w")))
      assert(overlaid == full,
        s"ndiff=${((overlaid.toSet diff full.toSet) ++ (full.toSet diff overlaid.toSet)).size}")
    } finally q.stop()
  }
}
