package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scale

class ScaleSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed dataset") {
    // 90% of left rows share one hot key
    val left = (1 to 20000).map(i => (if (i % 10 == 0) i % 50 else 7L, i.toLong))
      .toDF("k", "v")
    val right = (0 until 50).map(k => (k.toLong, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).agg(count(lit(1)), sum($"v".cast("long")))
      .collect()(0)
    val salted = Scale.saltedJoin(left, right, "k", saltFactor = 8)
      .agg(count(lit(1)), sum($"v".cast("long"))).collect()(0)
    assert(plain == salted)
    // left outer also supported
    val lo = Scale.saltedJoin(left, right.filter($"k" < 5), "k", 8, "left")
    assert(lo.count() == left.count())
  }

  test("selfPairs: triangle-salted hot buckets equal plain all-pairs") {
    // one degenerate "identical template" bucket (key 'hot' duplicated
    // 500x) plus cold keys — the LSH band-skew fixture
    val rows = (1 to 500).map(i => ("hot", i.toLong)) ++
      (1 to 40).map(i => (s"cold_${i % 7}", 1000L + i))
    val df = rows.toDF("sig", "doc_id")
    val got = Scale.selfPairs(df, Seq("sig"), "doc_id", saltFactor = 4, hotThreshold = 100)
    val want = df.as("a").join(df.as("b"),
        $"a.sig" === $"b.sig" && $"a.doc_id" < $"b.doc_id")
      .select($"a.sig", $"a.doc_id".as("doc_id_1"), $"b.doc_id".as("doc_id_2"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // hot-bucket pair work is spread over multiple salt cells: the
    // triangle join's per-cell input is ~n/S, not n
    val hotPairs = got.filter($"sig" === "hot").count()
    assert(hotPairs == 500L * 499 / 2)
  }

  test("selfPairs: hot-key cap overflow stays correct (heaviest salted first)") {
    // three hot groups, cap of 1: only the heaviest gets salted, the
    // overflow takes the plain join — output must still equal all-pairs
    val rows = (1 to 300).map(i => ("hot_a", i.toLong)) ++
      (1 to 200).map(i => ("hot_b", 1000L + i)) ++
      (1 to 150).map(i => ("hot_c", 2000L + i)) ++
      (1 to 20).map(i => (s"cold_$i", 3000L + i))
    val df = rows.toDF("sig", "doc_id")
    val got = Scale.selfPairs(df, Seq("sig"), "doc_id",
      saltFactor = 3, hotThreshold = 100, hotKeyCap = 1)
    val want = df.as("a").join(df.as("b"),
        $"a.sig" === $"b.sig" && $"a.doc_id" < $"b.doc_id")
      .select($"a.sig", $"a.doc_id".as("doc_id_1"), $"b.doc_id".as("doc_id_2"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("exactQuantile == percentile aggregate on odd/even counts and skew") {
    val li = Tables.lineitem(spark, sfDir)
    for (c <- Seq("l_quantity", "l_extendedprice"); q <- Seq(0.5, 0.25, 0.9)) {
      val want = li.selectExpr(s"percentile($c, $q)").collect()(0).getDouble(0)
      val got = Scale.exactQuantile(li, c, q)
      assert(got == want, s"$c q=$q: $got != $want")
    }
    // even count + duplicate-heavy column (interpolation + degenerate band)
    val small = (1 to 10).map(i => math.min(i, 5).toDouble).toDF("v")
    assert(Scale.exactQuantile(small, "v", 0.5) ==
      small.selectExpr("percentile(v, 0.5)").collect()(0).getDouble(0))
    val const = Seq.fill(7)(3.14).toDF("v")
    assert(Scale.exactQuantile(const, "v", 0.5) == 3.14)
    // heavy duplicate run straddling the median: the run is resolved by
    // counts, never collected (cap forces the count-based path)
    val heavy = ((1 to 30000).map(_ => 5.0) ++ (1 to 10000).map(i => i / 100.0)).toDF("v")
    val wantH = heavy.selectExpr("percentile(v, 0.5)").collect()(0).getDouble(0)
    assert(Scale.exactQuantile(heavy, "v", 0.5, maxBandRows = 500) == wantH)
    // rank exactly at a run boundary (interpolates run value with next)
    val edge = (Seq.fill(5)(1.0) ++ Seq.fill(5)(2.0)).toDF("v")
    assert(Scale.exactQuantile(edge, "v", 0.45) ==
      edge.selectExpr("percentile(v, 0.45)").collect()(0).getDouble(0))
  }

  test("exactQuantileGrid == percentile aggregate cell-by-cell") {
    val li = Tables.lineitem(spark, sfDir)
    val cs = Seq("l_quantity", "l_extendedprice", "l_discount")
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val grid = Scale.exactQuantileGrid(li, cs, qs)
    assert(grid.size == cs.length * qs.length)
    for (c <- cs; q <- qs) {
      val want = li.selectExpr(s"percentile($c, $q)").collect()(0).getDouble(0)
      assert(grid((c, q)) == want, s"$c q=$q: ${grid((c, q))} != $want")
    }
    // grid agrees with the single-q path it generalizes
    for (c <- cs)
      assert(grid((c, 0.5)) == Scale.exactQuantile(li, c, 0.5))
    // duplicate-heavy column under a tight band cap: both fences exact
    import spark.implicits._
    val heavy = ((1 to 30000).map(_ => 5.0) ++ (1 to 10000).map(i => i / 100.0)).toDF("v")
    val g2 = Scale.exactQuantileGrid(heavy, Seq("v"), Seq(0.25, 0.75), maxBandRows = 500)
    for (q <- Seq(0.25, 0.75))
      assert(g2(("v", q)) ==
        heavy.selectExpr(s"percentile(v, $q)").collect()(0).getDouble(0))
  }

  test("bucketed tables join without a shuffle exchange") {
    val s2 = spark
    val prevThreshold = s2.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
    val o = Tables.orders(s2, sfDir)
    val l = Tables.lineitem(s2, sfDir)
    Scale.writeBucketed(o.select($"o_orderkey", $"o_totalprice"), "o_orderkey", 8, "orders_b")
    Scale.writeBucketed(l.select($"l_orderkey", $"l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", 8, "lineitem_b")
    val joined = s2.table("orders_b").join(s2.table("lineitem_b"), "o_orderkey")
    assert(!Scale.hasShuffle(joined), "bucketed join must not shuffle:\n" +
      joined.queryExecution.executedPlan.toString.take(2000))
    // and the join is still correct
    val expect = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
    assert(joined.count() == expect)
    // the same join on raw (unbucketed) frames DOES shuffle under SMJ
    val raw = o.select($"o_orderkey").join(
      l.select($"l_orderkey").withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
    assert(Scale.hasShuffle(raw))
    } finally {
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s2.sql("DROP TABLE IF EXISTS orders_b")
      s2.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}

class StitchSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window
  import graft.ops.{Scale, Stitch}

  private def events = Tables.events(spark, sfDir)

  test("carryForward == global-window last(ignoreNulls) and stays partitioned") {
    val stitched = graft.ops.EventQueries.queries("step_interpolate")(spark, sfDir)
    val w = Window.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = events.withColumn("last_purchase",
        last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true).over(w))
      .select(col("event_id"), col("last_purchase"))
    assert(stitched.exceptAll(global).isEmpty && global.exceptAll(stitched).isEmpty)
    assert(!Scale.hasSinglePartitionExchange(stitched), "stitched carryForward must not single-task")
    assert(Scale.hasSinglePartitionExchange(global), "sanity: the naive form does single-task")
  }

  test("globalSeq == global row_number on the selected range, stays partitioned") {
    val stitched = graft.ops.WarpQueries.queries("event_range")(spark, sfDir)
    val w = Window.orderBy(col("ts"), col("event_id"))
    val global = events.withColumn("seq", row_number().over(w))
      .filter(col("seq") >= 101 && col("seq") <= 200)
      .select(col("seq"), col("event_id"))
    assert(stitched.exceptAll(global).isEmpty && global.exceptAll(stitched).isEmpty)
    assert(!Scale.hasSinglePartitionExchange(stitched))
  }

  test("blockMax == global look-ahead frame, stays partitioned, survives sparse chunks") {
    val stitched = graft.ops.EventQueries.queries("block_max_norm")(spark, sfDir)
    val w = Window.orderBy(col("event_id")).rowsBetween(0, 9)
    val global = events.withColumn("block_max", max(col("value")).over(w))
      .select(col("event_id"), col("value"), col("block_max"))
    assert(stitched.exceptAll(global).isEmpty && global.exceptAll(stitched).isEmpty)
    assert(!Scale.hasSinglePartitionExchange(stitched))
    // sparse/tiny chunks: ids spaced so most chunks hold < follow rows and
    // several chunk ranges are empty — the head-spill chain must cross them
    import spark.implicits._
    val sparse = (0 until 40).map(i => (i.toLong * 37L, (i % 13).toDouble)).toDF("id", "v")
    val got = Stitch.blockMax(sparse, expr("id div 100"), col("id"), col("v"), 9, "bm")
      .select("id", "bm")
    val want = sparse.withColumn("bm",
        max(col("v")).over(Window.orderBy(col("id")).rowsBetween(0, 9)))
      .select("id", "bm")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}

class FunnelSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("firstTouchFunnel: constructed stages, strict ordering, out-of-order demotion") {
    def ev(u: Long, t: Long, ty: String) =
      (u * 1000 + t, new java.sql.Timestamp(t * 1000), u, ty, 1.0, "")
    val rows = Seq(
      // user 1: full ordered chain → stage 3
      ev(1, 10, "view"), ev(1, 20, "click"), ev(1, 30, "purchase"),
      // user 2: view then click, no purchase → stage 2
      ev(2, 10, "view"), ev(2, 20, "click"),
      // user 3: click BEFORE first view → stage 1 (first-touch is strict)
      ev(3, 20, "view"), ev(3, 10, "click"), ev(3, 30, "purchase"),
      // user 4: never viewed → stage 0
      ev(4, 10, "click"), ev(4, 20, "purchase"),
      // user 5: purchase at the SAME instant as click → demoted to 2
      ev(5, 10, "view"), ev(5, 20, "click"), ev(5, 20, "purchase"),
      // user 6: view only → stage 1
      ev(6, 10, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.TemporalQueries.firstTouchFunnel(
        rows, Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 1L, 1 -> 2L, 2 -> 2L, 3 -> 1L))
    // partition-invariant (pure aggregate of first-touch minima)
    val rep = graft.ops.TemporalQueries.firstTouchFunnel(
        rows.repartition(7), Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rep == got)
  }

  test("cohortRetention: constructed weekly triangle, distinct within-week activity") {
    val wk = 604800L
    def ev(u: Long, week: Long, k: Long) =
      (u * 100 + week * 10 + k, new java.sql.Timestamp((week * wk + k * 60) * 1000),
        u, "view", 1.0, "")
    val rows = Seq(
      // user 1: weeks 0, 1, 3 (two events in week 0 — distinct'd)
      ev(1, 0, 1), ev(1, 0, 2), ev(1, 1, 1), ev(1, 3, 1),
      // user 2: weeks 0, 1
      ev(2, 0, 1), ev(2, 1, 1),
      // user 3: cohort week 1 only
      ev(3, 1, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.TemporalQueries.cohortRetention(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 2L, (0L, 3L) -> 1L, (1L, 0L) -> 1L))
    val rep = graft.ops.TemporalQueries.cohortRetention(rows.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rep == got)
  }
}

class IvfSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._
  import graft.sim.Ivf

  test("IVF cell Column assignment matches driver-side k-means assignment") {
    val cents = Ivf.trainCentroids(spark, sfDir, k = 8)
    assert(cents.length == 8 && cents.head.length == 64)
    val fromSql = graft.sim.SimilarityQueries.queries("emb_ivf_assign")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = Tables.embeddings(spark, sfDir).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    vecs.foreach { case (id, v) =>
      assert(fromSql(id) == Ivf.assign(v, cents), s"vec $id")
    }
    // cells are actually used (more than one non-empty cell)
    assert(fromSql.values.toSet.size > 1)
  }

  test("IVF training sample is bounded (no full-corpus collect)") {
    // the quantizer must be trainable from vec_id < SAMPLE_N alone:
    // identical centroids from the full table and the pre-filtered table
    val fromFull = Ivf.trainCentroids(spark, sfDir, k = 8)
    val sample = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < Ivf.SAMPLE_N).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val direct = Ivf.kmeans(sample, 8)
    fromFull.zip(direct).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("IVF multi-probe (nprobe=2) recall@5 >= single-probe recall@5") {
    val cents = Ivf.trainCentroids(spark, sfDir, k = 8)
    // brute-force exact cosine top-5 per query, driver-side ground truth
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth: Map[Long, Set[Long]] = (0L until 10L).map { qid =>
      val qv = vecs(qid)
      qid -> vecs.filter(_._1 != qid).toSeq
        .map { case (cid, v) => (cid, cos(qv, v)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(5).map(_._1).toSet
    }.toMap
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val byQ = rows.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      truth.map { case (q, t) => byQ.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size }
        .sum / truth.size
    }
    val r1 = recall(graft.sim.SimilarityQueries.queries("emb_ivf_topk")(spark, sfDir).collect())
    val r2 = recall(graft.sim.SimilarityQueries.queries("emb_ivf_topk_p2")(spark, sfDir).collect())
    assert(r2 >= r1, s"probe2 recall $r2 < probe1 recall $r1")
    assert(r2 > 0.0)
    // probe-2 candidate cells are a superset of the single assigned cell
    val probed = Ivf.withProbes(Tables.embeddings(spark, sfDir), cents, nprobe = 2)
      .select("vec_id", "probes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) =>
      val p = probed(id)
      assert(p.length == 2 && p.distinct.length == 2)
      assert(p.head == Ivf.assign(v, cents), s"first probe must be the assigned cell for vec $id")
    }
  }

  test("ann recall report: probing every cell recovers the full exact top-k") {
    // the audit's own sanity bound: nprobe == k cells turns the ANN
    // side into brute force, so recall must read exactly 1000000 ppm
    val full = graft.sim.SimilarityQueries.annRecall(spark, sfDir, nprobe = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(full.size == 10 && full.values.forall(_ == 1000000L), s"got $full")
    // and the default 2-probe recall is sane: within [0, 1e6], not all 0
    val p2 = graft.sim.SimilarityQueries.annRecall(spark, sfDir)
      .collect().map(_.getLong(2))
    assert(p2.forall(v => v >= 0 && v <= 1000000L) && p2.sum > 0)
  }

  test("emb_pagerank == driver-side integer power iteration; leak-only mass") {
    val edges = graft.sim.SimilarityQueries.queries("emb_knn_join")(spark, sfDir)
      .select("vec_id", "nbr").collect().map(r => r.getLong(0) -> r.getLong(1))
    val nodes = Tables.embeddings(spark, sfDir).select("vec_id")
      .collect().map(_.getLong(0))
    val n = nodes.length.toLong
    val od = edges.groupBy(_._1).map { case (s2, es) => s2 -> es.length.toLong }
    val base = (15L * 1000000000L) / (100L * n)
    var pr = nodes.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s2, d) => in(d) += (pr(s2) * 85L) / (100L * od(s2)) }
      pr = nodes.map(v => v -> (base + in(v))).toMap
    }
    val got = graft.sim.SimilarityQueries.queries("emb_pagerank")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == pr)
    // div truncation and dangling nodes only LEAK mass — never create it
    assert(got.values.sum <= 1000000000L)
    assert(got.values.forall(_ >= base), "every node keeps at least the restart mass")
    // dense neighborhoods outrank the restart floor somewhere
    assert(got.values.max > base)
  }

  test("IVF top-k returns within-cell neighbors ranked by exact cosine") {
    val res = graft.sim.SimilarityQueries.queries("emb_ivf_topk")(spark, sfDir).collect()
    assert(res.nonEmpty)
    val cents = Ivf.trainCentroids(spark, sfDir, k = 8)
    val assignOf = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> Ivf.assign(r.getSeq[Float](1).map(_.toDouble).toArray, cents)).toMap
    // every neighbor shares the query's cell, ranks are 1..k per query
    res.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      rows.foreach(r => assert(assignOf(r.getLong(2)) == assignOf(qid)))
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
      // cosine non-increasing with rank
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      byRank.zip(byRank.tail).foreach { case (a, b) => assert(a >= b) }
    }
  }
}

class PqSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._
  import graft.sim.{Ivf, Pq}

  private def qround(p: Double): Long = graft.functions.QuantKernels.qround(p)

  test("distributed PQ codes match driver-side encoding (codegen kernel parity)") {
    val cents = Ivf.trainCentroids(spark, sfDir, k = 8)
    val cbs = Pq.trainCodebooks(spark, sfDir, cents)
    assert(cbs.length == Pq.M && cbs(0).length == Pq.KCODES)
    val dsub = cbs(0)(0).length
    val got = Pq.withResidual(Ivf.withCell(Tables.embeddings(spark, sfDir), cents), cents)
      .withColumn("codes", Pq.encodeCol(col("res"), cbs))
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    vecs.foreach { case (id, v) =>
      val c = cents(Ivf.assign(v, cents))
      // residual exactly as the Column expression computes it
      val res = Array.tabulate(v.length)(d => v(d).toFloat.toDouble - c(d))
      val want = Array.tabulate(Pq.M) { sub =>
        (0 until Pq.KCODES).map { j =>
          (0 until dsub).map { d =>
            val diff = res(sub * dsub + d) - cbs(sub)(j)(d)
            qround(diff * diff * 1e12)
          }.sum -> j
        }.minBy(identity)._2
      }
      assert(got(id).sameElements(want), s"vec $id: ${got(id).toSeq} vs ${want.toSeq}")
      got(id).foreach(code => assert(code >= 0 && code < Pq.KCODES))
    }
  }

  test("ADC kernel matches driver-side asymmetric distance") {
    val cents = Ivf.trainCentroids(spark, sfDir, k = 8)
    val cbs = Pq.trainCodebooks(spark, sfDir, cents)
    val dsub = cbs(0)(0).length
    val base = Pq.withResidual(Ivf.withCell(Tables.embeddings(spark, sfDir), cents), cents)
      .withColumn("codes", Pq.encodeCol(col("res"), cbs))
    val q = base.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("res").as("qr"), col("cell"))
    val c = base.select(col("vec_id").as("cid"), col("codes"), col("cell"))
    val got = broadcast(q).join(c, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("adc", Pq.adcCol(col("qr"), col("codes"), cbs))
      .select("qid", "cid", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    // recompute a sample of pairs on the driver
    val resOf = base.select("vec_id", "res").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val codesOf = base.select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    got.take(200).foreach { case ((qid, cid), adc) =>
      val qr = resOf(qid); val codes = codesOf(cid)
      val want = (0 until Pq.M).map { sub =>
        (0 until dsub).map { d =>
          val diff = qr(sub * dsub + d) - cbs(sub)(codes(sub))(d)
          qround(diff * diff * 1e12)
        }.sum
      }.sum
      assert(adc == want, s"($qid,$cid)")
    }
  }

  test("IVF-PQ recall@5 >= plain IVF recall@5 (shortlist + exact re-rank)") {
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth: Map[Long, Set[Long]] = (0L until 10L).map { qid =>
      val qv = vecs(qid)
      qid -> vecs.filter(_._1 != qid).toSeq
        .map { case (cid, v) => (cid, cos(qv, v)) }
        .sortBy { case (cid, cv) => (-cv, cid) }.take(5).map(_._1).toSet
    }.toMap
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val byQ = rows.groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(2)).toSet }
      truth.map { case (k, t) => byQ.getOrElse(k, Set.empty[Long]).intersect(t).size.toDouble / t.size }
        .sum / truth.size
    }
    val rIvf = recall(graft.sim.SimilarityQueries.queries("emb_ivf_topk")(spark, sfDir).collect())
    val rPq = recall(graft.sim.SimilarityQueries.queries("emb_ivfpq_topk")(spark, sfDir).collect())
    assert(rPq >= rIvf, s"IVF-PQ recall $rPq < IVF recall $rIvf")
    assert(rPq > 0.0)
  }

  test("materializeCompact: leaf-scan handoff, rows preserved, plan pinned") {
    import spark.implicits._
    val src = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
      .groupBy("k").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val m = Scale.materializeCompact(src)
    // the handoff contract: downstream consumers see a LEAF scan — the
    // aggregate subtree can never be re-inlined per consumer
    assert(m.queryExecution.logical.children.isEmpty,
      m.queryExecution.logical.toString)
    assert(m.orderBy("k").collect().map(_.toString).toSeq ==
      src.orderBy("k").collect().map(_.toString).toSeq)
  }
}
