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

  /** Integer-quantized squared distance of the embedding column to one
    * centroid literal: Σ_d round((x_d − c_d)² · 1e12). */
  private def distE12(c: Array[Double]): String = {
    val lits = c.mkString("array(", ", ", ")")
    s"aggregate(zip_with(embedding, $lits, (x, cd) -> CAST(round((CAST(x AS DOUBLE) - cd) * (CAST(x AS DOUBLE) - cd) * 1e12) AS BIGINT)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
  }

  private def distE12Sql(c: Array[Double]): String = {
    val lits = c.mkString("[", ", ", "]")
    s"CAST(list_sum(list_transform(range(1, len(embedding) + 1), i -> CAST(round((CAST(embedding[i] AS DOUBLE) - ($lits)[i]) * (CAST(embedding[i] AS DOUBLE) - ($lits)[i]) * 1e12) AS BIGINT))) AS BIGINT)"
  }

  /** Cell-assignment Column: argmin over centroid distances (ties →
    * lowest cell id, matching [[assign]]). */
  def cellColumn(centroids: Array[Array[Double]]): Column = {
    val dists = centroids.indices.map(c => expr(distE12(centroids(c))))
    // fold: keep (bestDist, bestId); strict < keeps the lowest id on ties
    centroids.indices.tail.foldLeft((dists(0), lit(0))) {
      case ((bd, bi), c) =>
        (when(dists(c) < bd, dists(c)).otherwise(bd),
          when(dists(c) < bd, lit(c)).otherwise(bi))
    }._2
  }

  /** Same argmin as DuckDB SQL. */
  def cellSql(centroids: Array[Array[Double]]): String = {
    val dists = centroids.indices.map(c => distE12Sql(centroids(c)))
    var bd = dists(0)
    var bi = "0"
    for (c <- 1 until centroids.length) {
      val newBd = s"(CASE WHEN ${dists(c)} < $bd THEN ${dists(c)} ELSE $bd END)"
      bi = s"(CASE WHEN ${dists(c)} < $bd THEN $c ELSE $bi END)"
      bd = newBd
    }
    bi
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
