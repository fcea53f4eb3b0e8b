package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import graft.sim.Pca
import graft.functions.{PcaProjectE12, QuantKernels}

/** Pins for the PCA substrate: the Jacobi eigensolver against analytic
  * eigenpairs, the fit contract (ordering, orthonormality, sign
  * normalization, determinism), and the codegen'd projection kernel
  * against a driver reference including null propagation. */
class PcaSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("jacobiEigen recovers analytic eigenpairs of a known symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (v=[1,1]/√2) and 1 (v=[1,-1]/√2)
    val (evals, evecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = evals.indices.sortBy(i => -evals(i))
    assert(math.abs(evals(order(0)) - 3.0) < 1e-12)
    assert(math.abs(evals(order(1)) - 1.0) < 1e-12)
    val v0 = evecs(order(0))
    assert(math.abs(math.abs(v0(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v0(0) - v0(1)) < 1e-12, "eigenvector of 3 is [1,1]/sqrt(2)")
    // residual check on a 4x4 with repeated structure (exercises the
    // theta==0 equal-diagonal rotation branch)
    val m = Array(
      Array(1.0, 0.5, 0.0, 0.2),
      Array(0.5, 1.0, 0.3, 0.0),
      Array(0.0, 0.3, 1.0, 0.5),
      Array(0.2, 0.0, 0.5, 1.0))
    val (ev2, vv2) = Pca.jacobiEigen(m)
    for (j <- 0 until 4; i <- 0 until 4) {
      val av = (0 until 4).map(d => m(i)(d) * vv2(j)(d)).sum
      assert(math.abs(av - ev2(j) * vv2(j)(i)) < 1e-10,
        s"A v != lambda v at ($i, $j)")
    }
  }

  test("fit orders by variance, returns orthonormal sign-fixed components, deterministically") {
    val rnd = new scala.util.Random(7)
    // anisotropic cloud: dominant direction along (3, 1, 0, ...) in 8-d
    val sample = Array.fill(300) {
      val t = rnd.nextGaussian() * 3.0
      val n = Array.fill(8)(rnd.nextGaussian() * 0.3)
      n(0) += t * 3 / math.sqrt(10.0)
      n(1) += t * 1 / math.sqrt(10.0)
      n
    }
    val (mean, comps, evals) = Pca.fit(sample, k = 3)
    assert(mean.length == 8 && comps.length == 3)
    assert(evals(0) >= evals(1) && evals(1) >= evals(2), "eigenvalue order")
    // orthonormal
    for (a <- 0 until 3; b <- a until 3) {
      val dot = (0 until 8).map(d => comps(a)(d) * comps(b)(d)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-10, s"components not orthonormal at ($a,$b): $dot")
    }
    // first component aligns with the planted direction
    val planted = Array(3.0, 1.0).map(_ / math.sqrt(10.0))
    val align = math.abs(comps(0)(0) * planted(0) + comps(0)(1) * planted(1))
    assert(align > 0.99, s"pc1 must align with the planted direction, got $align")
    // sign convention: largest-|coordinate| entry is positive
    comps.foreach { c =>
      val arg = c.indices.maxBy(i => math.abs(c(i)))
      assert(c(arg) > 0, s"sign normalization violated: ${c.toSeq}")
    }
    // bit-identical on rerun
    val (m2, c2, _) = Pca.fit(sample, k = 3)
    assert(mean.toSeq == m2.toSeq && comps.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("the codegen'd projection kernel matches the driver reference on the embeddings table") {
    val (mean, comps) = Pca.train(spark, sfDir, k = 4)
    val got = Pca.project(Tables.embeddings(spark, sfDir), mean, comps)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(i => r.getLong(i))).toMap
    val expected = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect().map { r =>
        val x = r.getSeq[Float](1)
        r.getLong(0) -> comps.indices.map { k =>
          var acc = 0L
          var d = 0
          while (d < mean.length) {
            acc += QuantKernels.qround((x(d).toDouble - mean(d)) * comps(k)(d) * 1e12)
            d += 1
          }
          acc
        }.toSeq
      }.toMap
    assert(got == expected)
  }

  test("reduced-space SemDeDup: survivors = min-id representatives of the bucket-local pair graph") {
    import graft.sim.SimilarityQueries
    val e = Tables.embeddings(spark, sfDir)
    val (mu, comps) = Pca.train(spark, sfDir, k = 4)
    val got = SimilarityQueries.semdedupPca(e, mu, comps)
      .collect().map(_.getLong(0)).toSet
    // driver reference: project + grid bucket + exact-cosine pairs + union-find
    val (cuts, bins) = SimilarityQueries.cachedPcaGrid.get
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def proj(x: Array[Float]): Array[Long] = comps.map { p =>
      x.indices.map(d => QuantKernels.qround((x(d).toDouble - mu(d)) * p(d) * 1e12)).sum
    }
    def bucket(pc: Array[Long]): Long =
      cuts.indices.map { j =>
        cuts(j).count(c => pc(j) > c).toLong * math.pow(bins.toDouble, j.toDouble).toLong
      }.sum
    def qdotD(a: Array[Float], b: Array[Float]): Long =
      a.indices.map(d => QuantKernels.qround(a(d).toDouble * b(d).toDouble * 1e12)).sum
    // equi-depth buckets must actually be balanced on the sample it
    // trained from: no bucket may hold more than a small multiple of
    // the expected occupancy (the anti-quadratic property the grid
    // exists for)
    val byBucket = vecs.toSeq.groupBy { case (_, x) => bucket(proj(x)) }
    val expOcc = vecs.size.toDouble / math.pow(bins.toDouble, cuts.length.toDouble)
    assert(byBucket.values.map(_.size).max <= math.max(8.0, 8 * expOcc),
      s"grid occupancy skewed: max=${byBucket.values.map(_.size).max} expected≈$expOcc")
    val parent = scala.collection.mutable.Map(vecs.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((_, members) <- byBucket; Seq((i1, x1), (i2, x2)) <- members.sortBy(_._1).combinations(2)) {
      val cos = qdotD(x1, x2).toDouble /
        (math.sqrt(qdotD(x1, x1).toDouble) * math.sqrt(qdotD(x2, x2).toDouble))
      if (cos >= 0.25) { val (a, b) = (find(i1), find(i2)); if (a != b) parent(math.max(a, b)) = math.min(a, b) }
    }
    val want = vecs.keySet.filter(id => find(id) == id)
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    // the pair graph must be non-trivial on the fixture or this pins nothing
    assert(want.size < vecs.size, "fixture must contain reduced-space duplicates")
  }

  test("whitening: training-sample coordinates decorrelate to unit variance") {
    val (mean, w) = Pca.trainWhiten(spark, sfDir, k = 4)
    assert(w.length == 4 && mean.nonEmpty)
    // apply the whitened projection to the SAME bounded training sample
    // the model fit on; its empirical per-coordinate variance must be
    // ~1 and cross-correlations ~0 (exact up to eps + e12 quantization)
    val sample = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < Pca.SAMPLE_N).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val coords = sample.map { x =>
      w.map { v => v.indices.map(i => (x(i) - mean(i)) * v(i)).sum }
    }
    val n = coords.length
    for (a <- 0 until 4; b <- a until 4) {
      val cov = coords.map(c => c(a) * c(b)).sum / n -
        (coords.map(_(a)).sum / n) * (coords.map(_(b)).sum / n)
      if (a == b) assert(math.abs(cov - 1.0) < 1e-6, s"var($a)=$cov")
      else assert(math.abs(cov) < 1e-6, s"cov($a,$b)=$cov")
    }
    // the engine query output matches the driver fold on the sample rows
    val got = graft.sim.SimilarityQueries.queries("emb_whiten")(spark, sfDir)
      .filter(col("vec_id") < Pca.SAMPLE_N).orderBy("vec_id")
      .collect().map(r => (1 to 4).map(i => r.getLong(i)).toArray)
    val want = sample.map { x =>
      w.map { v =>
        v.indices.map(i =>
          QuantKernels.qround((x(i) - mean(i)) * v(i) * 1e12)).sum
      }
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, e) => assert(g.sameElements(e)) }
  }

  test("projection nulls on dimension mismatch and null elements") {
    val mean = Array(0.0, 0.0)
    val comps = Array(Array(1.0, 0.0))
    def proj(c: org.apache.spark.sql.Column) =
      GraftBridge.column(PcaProjectE12(GraftBridge.expression(c), mean, comps))
    val mm = Seq(Tuple1(Array(1f, 2f, 3f))).toDF("embedding")
      .select(proj(col("embedding")).as("p")).collect()(0)
    assert(mm.isNullAt(0), "dim mismatch must null")
    val nn = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS embedding")
      .select(proj(col("embedding")).as("p")).collect()(0)
    assert(nn.isNullAt(0), "null element must null")
  }
}
