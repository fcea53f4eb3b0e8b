package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-style ANN: a coarse k-means quantizer trained on the driver
  * (vectors sampled/collected once), cell assignment as pure Column
  * arithmetic with the centroids baked in as literals, and search
  * restricted to the query's cell — the inverted-file pruning shape.
  *
  * Cross-engine exactness: per-dimension squared differences are
  * quantized to integers before summation (same policy as the cosine
  * queries), and k-means itself is deterministic (fixed init = first k
  * vectors in vec_id order, fixed iteration count), so the centroids —
  * and therefore the assignments — are reproducible and the oracle can
  * evaluate the identical arithmetic from the same literal centroids.
  */
object Ivf {

  /** Deterministic Lloyd's k-means on the driver. */
  def kmeans(vectors: Array[Array[Double]], k: Int, iters: Int = 10): Array[Array[Double]] = {
    require(vectors.length >= k && k > 0)
    val dim = vectors.head.length
    var centroids = vectors.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Int](k)
      vectors.foreach { v =>
        val c = assign(v, centroids)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(d => sums(c)(d) / counts(c))
      }
    }
    centroids
  }

  /** Nearest-centroid index (squared euclidean, ties → lowest index). */
  def assign(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      var acc = 0.0
      var d = 0
      while (d < v.length) {
        val diff = v(d) - centroids(c)(d)
        acc += diff * diff
        d += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  /** Append a `cell` column: argmin over centroid distances (ties →
    * lowest cell id, matching [[assign]]).
    *
    * The entire argmin is ONE nested higher-order expression over a 2-D
    * centroid literal. Per-centroid intermediate columns (or a when-
    * fold) get inlined by CollapseProject — especially across self-joins
    * — duplicating every distance aggregate up to 16×, which blew
    * codegen to tens of seconds per query; a single self-contained
    * expression gives the optimizer nothing to copy.
    */
  def withCell(df: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val cents = centroids.map(_.mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    val dists =
      s"""transform(sequence(1, ${centroids.length}), c ->
         |  aggregate(
         |    zip_with(embedding, element_at($cents, c),
         |      (x, cd) -> CAST(round((CAST(x AS DOUBLE) - cd) * (CAST(x AS DOUBLE) - cd) * 1e12) AS BIGINT)),
         |    CAST(0 AS BIGINT), (acc, v) -> acc + v))""".stripMargin
    // array_position returns the FIRST match → lowest cell id on ties
    df.withColumn("cell",
      expr(s"CAST(array_position($dists, array_min($dists)) - 1 AS INT)"))
  }

  /** Collect the corpus and train the coarse quantizer (deterministic). */
  def trainCentroids(spark: SparkSession, dir: String, k: Int): Array[Array[Double]] = {
    val vecs = graft.Tables.embeddings(spark, dir)
      .orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    kmeans(vecs, k)
  }
}
