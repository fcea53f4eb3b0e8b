package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Large-scale regression bench (VERDICT r2 #9): the SCALE.md headline
  * numbers as a harness-runnable main instead of prose — synthesizes a
  * 100M-row event stream, a 2M-doc corpus (with planted near-dups and
  * one degenerate template bucket to force the salting path), and a
  * 2M-vector embedding corpus, then times the three pillars:
  *
  *   - `hist_3d_rel`   relational N-D histogram, 240k-bin 3D grid
  *   - `hist_3d_shard` sharded dense path on the same grid
  *   - `lsh_pairs`     full MinHash/LSH dedup chain (skew-salted,
  *                     native-hash configuration)
  *   - `cc_clusters`   pair graph → dedup clusters (large-star/
  *                     small-star connected components)
  *   - `ivf_topk`      IVF ANN: bounded training, codegen cell assign,
  *                     broadcast probe, cell-local re-rank
  *
  * All inputs are generated distributively from `spark.range` (hash
  * arithmetic inside whole-stage codegen — no driver materialization,
  * no disk), deterministic run to run. Prints ONE JSON line like Bench;
  * commit the output as BENCH_LARGE.json so round-over-round scale
  * regressions show up in diffs.
  *
  * Row counts are env-tunable (SPARK_GRAFT_LARGE_ROWS/DOCS/VECS) so the
  * same harness can smoke-run small in CI.
  */
object BenchLarge {

  private def events(spark: SparkSession, rows: Long): DataFrame =
    spark.range(rows).select(
      (pmod(hash(col("id"), lit(1)), lit(100000)).cast("double") / lit(200.0)).as("value"),
      pmod(hash(col("id"), lit(2)), lit(200)).cast("double").as("user"),
      pmod(hash(col("id"), lit(3)), lit(24)).cast("double").as("hour"))

  /** Synthetic corpus: ~1% of docs duplicate their predecessor (pair
    * hits), and doc_ids < 1100 all share ONE template — a degenerate
    * band bucket just above Scale.selfPairs' hot threshold (1000), so
    * the triangle-salted path is exercised while the quadratic verified
    * output stays bounded (~605k pairs). */
  private def docs(spark: SparkSession, n: Long, template: Long): DataFrame = {
    val base = s"CASE WHEN id < $template THEN 0 WHEN id % 100 = 1 THEN id - 1 ELSE id END"
    val toks = (0 until 18).map(k =>
      concat(lit(s"tok${k}_"), pmod(hash(expr(base), lit(k)), lit(5000))))
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", toks: _*).as("text"))
  }

  private def embeddings(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 64), d -> CAST(CAST(pmod(hash(id, d), 2000) AS DOUBLE) / 1000.0 - 1.0 AS FLOAT))")
        .as("embedding"))

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_LARGE_ROWS", "100000000").toLong
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_LARGE_DOCS", "2000000").toLong
    val nVecs = sys.env.getOrElse("SPARK_GRAFT_LARGE_VECS", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.binning.{BinAxis, Binning, NdHistogramAgg}

    val axes3 = Seq(
      col("user") -> BinAxis("user", 40, 0.0, 200.0),
      col("hour") -> BinAxis("hour", 24, 0.0, 24.0),
      col("value") -> BinAxis("value", 250, 0.0, 500.0)) // 240k bins

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val checks = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def timed(name: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val out = f
      results(name) = (System.nanoTime() - t0) / 1e9
      checks(name) = out
    }

    val template = sys.env.getOrElse("SPARK_GRAFT_LARGE_TEMPLATE", "1100").toLong
    val persist = sys.env.getOrElse("SPARK_GRAFT_LARGE_PERSIST", "true").toBoolean

    // warm-up every measured chain first (JIT + whole-stage-codegen
    // compilation): the cold first run of the LSH chain measured ~9x
    // its steady state (140 s vs 15 s at 2M docs) — committing that
    // would make the numbers compiler benchmarks, not operator
    // benchmarks. The LSH warm pass must run at FULL size: Range codegen
    // inlines the row count into the generated source, so a small-slice
    // warm-up compiles different classes than the measured run. The
    // explicit clearCache matters too — Spark's CacheManager matches by
    // canonicalized plan, so without it the timed run would silently
    // read the warm pass's persisted lineage instead of building its
    // own (measuring cache reads, not the chain).
    Binning.histogramNd(events(spark, 1000000L), axes3).write
      .format("noop").mode("overwrite").save()
    graft.text.TextQueries.lshPairs(docs(spark, nDocs, template),
      persistLineage = persist, portableHash = false).count()
    spark.catalog.clearCache()

    timed("hist_3d_rel") {
      val h = Binning.histogramNd(events(spark, rows), axes3)
      h.agg(sum("cnt")).collect()(0).getLong(0)
    }
    timed("hist_3d_shard") {
      val h = NdHistogramAgg.histogramNdDenseSharded(events(spark, rows), axes3)
      h.agg(sum("cnt")).collect()(0).getLong(0)
    }
    var pairs: DataFrame = null
    timed("lsh_pairs") {
      // portableHash=false: native xxhash64 shingle hashing — the
      // production-scale configuration (the md5 portable hash exists for
      // DuckDB-oracle parity and is benchmarked by the sf-scale Bench)
      pairs = graft.text.TextQueries.lshPairs(docs(spark, nDocs, template),
        persistLineage = persist, portableHash = false)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairs.count()
    }
    // pair graph → dedup clusters (large-star/small-star iteration);
    // the 605k-pair template clique is the skew case: one component
    // absorbing 1100 nodes
    timed("cc_clusters") {
      graft.ops.Components.connectedComponents(pairs, "d1", "d2").count()
    }
    timed("ivf_topk") {
      val emb = embeddings(spark, nVecs)
      // bounded deterministic training, as in Ivf.trainCentroids
      val sample = emb.filter(col("vec_id") < graft.sim.Ivf.SAMPLE_N)
        .orderBy("vec_id").select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      val cents = graft.sim.Ivf.kmeans(sample, 8)
      val assigned = graft.sim.Ivf.withCell(emb, cents)
      def qdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        org.apache.spark.sql.GraftBridge.column(graft.functions.QuantizedDotE12(
          org.apache.spark.sql.GraftBridge.expression(a),
          org.apache.spark.sql.GraftBridge.expression(b)))
      val q = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("e1"), col("cell"))
      val c = assigned.select(col("vec_id").as("cid"), col("embedding").as("e2"), col("cell"))
      val scored = broadcast(q).join(c, Seq("cell")).filter(col("qid") =!= col("cid"))
        .withColumn("cosine", qdot(col("e1"), col("e2")).cast("double") /
          (sqrt(qdot(col("e1"), col("e1")).cast("double")) *
            sqrt(qdot(col("e2"), col("e2")).cast("double"))))
      val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5).count()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val cs = checks.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.sum
    val evPerSec = (2.0 * rows / (results("hist_3d_rel") + results("hist_3d_shard"))).toLong
    println(s"""{"metric":"bench_large","value":${f"$total%.2f"},"unit":"sec","rows":$rows,"docs":$nDocs,"vecs":$nVecs,"events_per_sec":$evPerSec,"queries":$qs,"outputs":$cs}""")
    spark.stop()
  }
}
