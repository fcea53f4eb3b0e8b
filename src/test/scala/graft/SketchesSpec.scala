package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Pins for the mergeable sketch indexes: HLL estimate accuracy vs the
  * exact distinct count, exact mergeability (sharded build == one-shot
  * build, register for register), histogram-quantile agreement with
  * the exact quantiles at grid resolution, and the incremental
  * contract (merging a new shard's sketch == full recompute). */
class SketchesSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val words = docs.select(explode(split(col("text"), " ")).as("w"))

  test("allocation-free rank == the array-filter reference spelling, all edge values") {
    import spark.implicits._
    // the comparison-chain bit length must be VALUE-identical to the
    // filter(sequence(...)) reference it replaced (the reference is the
    // DuckDB oracle's spelling, so any drift would break hash parity):
    // cover x = 0 (rank 49), powers of two, boundaries, and the 48-bit max
    val hs = (Seq(0L, 1L, 2L, 3L, 4095L, 4096L, 4097L) ++
      (0 until 48).flatMap(b => Seq((1L << b) * 4096L,
        (1L << b) * 4096L + 4095L)) ++
      Seq((1L << 60) - 1L, 987654321234567L)).distinct.filter(_ < (1L << 60))
    val df = hs.toDF("h")
    val both = df.select(
      Sketches.hllRankOf("h").as("got"),
      expr("""CAST(49 - size(filter(sequence(0, 47),
             |  b -> shiftleft(1L, b) <= (h div 4096))) AS INT)""".stripMargin).as("ref"))
      .collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"rank mismatch: got=${r.getInt(0)} ref=${r.getInt(1)}"))
  }

  test("HLL estimate lands within 5% of the exact distinct word count") {
    val exact = words.distinct().count().toDouble
    val est = Sketches.hllFinalize(Sketches.hllRegisters(words, col("w")))
      .collect()(0).getAs[Long]("est_e6").toDouble / 1e6
    // m=4096 -> relative standard error 1.04/sqrt(m) ~ 1.6%; 5% is 3 sigma
    assert(math.abs(est - exact) / exact < 0.05,
      s"est=$est exact=$exact (${math.abs(est - exact) / exact * 100}% off)")
  }

  test("HLL registers merge exactly: sharded max-merge == one-shot build") {
    val oneShot = Sketches.hllRegisters(words, col("w"))
      .orderBy("bucket").collect().map(_.toString).toSeq
    val sharded = Sketches.hllShards(
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w")),
      col("w"), pmod(col("doc_id"), lit(5)))
    val perShard = (0 until 5).map(i =>
      sharded.filter(col("shard") === i).select("bucket", "reg"))
    val merged = Sketches.hllMerge(perShard)
      .orderBy("bucket").collect().map(_.toString).toSeq
    assert(merged == oneShot, "max-merge of 5 shards must equal the one-shot registers")
  }

  test("HLL merge is idempotent and order-free") {
    val a = Sketches.hllRegisters(words.limit(3000), col("w"))
    val b = Sketches.hllRegisters(words, col("w"))
    val ab = Sketches.hllMerge(Seq(a, b)).orderBy("bucket").collect().map(_.toString).toSeq
    val ba = Sketches.hllMerge(Seq(b, a, b)).orderBy("bucket").collect().map(_.toString).toSeq
    assert(ab == ba)
  }

  test("histogram quantiles agree with exact quantiles (grid resolution)") {
    val merged = Sketches.histMerge(Seq(
      Sketches.histShards(docs, pmod(col("doc_id"), lit(4)))))
    val got = Sketches.histQuantiles(merged).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // exact lower order statistics computed directly
    val nt = docs.select(size(split(col("text"), " ")).cast("long").as("v"))
      .orderBy("v").collect().map(_.getLong(0))
    Seq(5, 25, 50, 75, 95).foreach { q =>
      val rank = (q.toLong * (nt.length - 1) / 100L).toInt // 0-based lower stat
      assert(got(("n_tokens", q)) == nt(rank).toDouble,
        s"n_tokens p$q: got ${got(("n_tokens", q))} exact ${nt(rank)}")
    }
    // mean_word_len: grid floor of the exact value, within 1e-3
    val mwl = docs.select(
        (((length(col("text")) - size(split(col("text"), " ")).cast("long") + 1) * 1000)
          / size(split(col("text"), " "))).cast("long").as("b"))
      .orderBy("b").collect().map(_.getLong(0))
    Seq(5, 50, 95).foreach { q =>
      val rank = (q.toLong * (mwl.length - 1) / 100L).toInt
      assert(math.abs(got(("mean_word_len", q)) - mwl(rank).toDouble / 1000.0) < 1e-9)
    }
  }

  test("grouped HLL: each group's estimate equals the global sketch of its slice") {
    val w = docs.select(col("source"),
      explode(split(col("text"), " ")).as("w"))
    val grouped = Sketches.hllFinalizeBy(
      Sketches.hllRegistersBy(w, col("w"), col("source"))).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(grouped.size > 1, "fixture needs multiple sources")
    grouped.keys.foreach { src =>
      val solo = Sketches.hllFinalize(Sketches.hllRegisters(
        w.filter(col("source") === src), col("w"))).collect()(0).toSeq
      assert(grouped(src) == solo, s"group $src diverges from its solo sketch")
    }
  }

  test("incremental distinct: old-index merge == full recompute over the union") {
    val (old, neu) = graft.text.TextQueries.snapshotSplit(docs)
    def w(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(split(col("text"), " ")).as("w"))
    val incr = Sketches.hllFinalize(Sketches.hllMerge(Seq(
      Sketches.hllRegisters(w(old), col("w")),
      Sketches.hllRegisters(w(neu), col("w"))))).collect()(0)
    val full = Sketches.hllFinalize(
      Sketches.hllRegisters(w(old).unionAll(w(neu)), col("w"))).collect()(0)
    assert(incr.toString == full.toString,
      s"incremental $incr != full recompute $full")
  }

  test("grouped quantile sketch == per-group solo recompute") {
    val byGrp = Sketches.histQuantilesBy(Sketches.histShards(docs, col("source")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getDouble(3))
      .toMap
    val groups = byGrp.keys.map(_._1).toSeq.distinct.sorted
    assert(groups.size > 1, "fixture must contain several sources")
    for (g <- groups.take(3)) {
      val solo = Sketches.histQuantiles(Sketches.histMerge(Seq(
          Sketches.histShards(docs.filter(col("source") === g), lit(0)))))
        .collect().map(r => (g, r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(solo.forall { case (k, v) => byGrp(k) == v },
        s"group $g must equal its solo-slice quantiles")
    }
  }

  // ---- CountMin frequency sketch ----

  private def cmSnap(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
    df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("CountMin estimate is one-sided: est >= exact for EVERY word, excess bounded") {
    val counters = Sketches.cmCounters(words, col("w"))
    val exact = words.groupBy("w").agg(count(lit(1)).as("exact_cnt"))
    val n = words.count()
    val joined = Sketches.cmEstimate(counters, exact.select("w"), col("w"))
      .withColumnRenamed("v", "w").join(exact, Seq("w")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
    assert(joined.nonEmpty)
    joined.foreach { case (w, (est, ex)) =>
      assert(est >= ex, s"'$w': est $est below exact $ex — CountMin can never undercount")
    }
    // expected excess per row is < n/w; min over d=4 rows — 10x is
    // far outside anything the fixed fixture produces
    val bound = 10L * n / Sketches.CmW + 1
    joined.foreach { case (w, (est, ex)) =>
      assert(est - ex <= bound, s"'$w': excess ${est - ex} above $bound")
    }
  }

  test("CountMin counters merge exactly over a DISJOINT split — and NOT idempotently") {
    val oneShot = cmSnap(Sketches.cmCounters(words, col("w")))
    def w(p: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === p)
      .select(explode(split(col("text"), " ")).as("w"))
    val shards = (0 until 3).map(p => Sketches.cmCounters(w(p), col("w")))
    assert(cmSnap(Sketches.cmMerge(shards)) == oneShot,
      "sum-merge of 3 disjoint shards must equal the one-shot counters")
    // re-merging a shard double-counts: the additive contract is NOT
    // the HLL max-merge — a duplicated shard must NOT go unnoticed
    val doubled = cmSnap(Sketches.cmMerge(shards :+ shards.head))
    assert(doubled != oneShot, "re-merged shard must over-count (additive, not idempotent)")
    assert(doubled.forall { case (cell, c) => c >= oneShot(cell) })
  }

  test("CountMin incremental: persisted even-doc index + odd shard == full counters") {
    def w(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(split(col("text"), " ")).as("w"))
    val oldIdx = graft.ops.Scale.materializeCompact(
      Sketches.cmCounters(w(docs.filter(col("doc_id") % 2 === 0)), col("w")))
    val merged = cmSnap(Sketches.cmMerge(Seq(oldIdx,
      Sketches.cmCounters(w(docs.filter(col("doc_id") % 2 === 1)), col("w")))))
    assert(merged == cmSnap(Sketches.cmCounters(words, col("w"))),
      "incremental merge must equal the full-corpus counters cell for cell")
  }
}
