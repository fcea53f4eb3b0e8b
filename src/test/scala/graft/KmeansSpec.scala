package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.Ivf

/** Pins for the distributed Lloyd refinement ([[Ivf.lloydRefine]]):
  * parity with a driver-side reference using the SAME quantized
  * assignment + rounded-mean update, inertia monotonicity over the
  * sample-only init, empty-cell stability, and repartition invariance. */
class KmeansSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** The codegen kernel's quantized squared distance: per-dim
    * round((x - c)^2 * 1e12) summed as longs. */
  private def qdist(v: Array[Double], c: Array[Double]): Long = {
    var acc = 0L
    var d = 0
    while (d < v.length) {
      val diff = v(d) - c(d)
      acc += math.rint(diff * diff * 1e12).toLong
      d += 1
    }
    acc
  }

  private def qassign(v: Array[Double], cents: Array[Array[Double]]): Int =
    cents.indices.minBy(c => (qdist(v, cents(c)), c))

  /** Driver-side reference of one refinement pass chain: quantized
    * assignment, exact mean, 1e-9 rounding, empty cells keep previous. */
  private def refRefine(vecs: Array[Array[Double]], init: Array[Array[Double]],
                        iters: Int): Array[Array[Double]] = {
    var cents = init
    for (_ <- 0 until iters) {
      val groups = vecs.groupBy(v => qassign(v, cents))
      cents = Array.tabulate(cents.length) { c =>
        groups.get(c) match {
          case None => cents(c)
          case Some(vs) =>
            Array.tabulate(cents.head.length)(d =>
              math.rint(vs.map(_(d)).sum / vs.length * 1e9) / 1e9)
        }
      }
    }
    cents
  }

  private def fixture(n: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(31)
    Array.tabulate(n) { i =>
      val center = if (i % 3 == 0) 0.8 else if (i % 3 == 1) -0.6 else 0.1
      // 3-decimal quantized coordinates (the embeddings-table regime),
      // pushed through float32 because the embedding column IS float32:
      // the engine averages the float-rounded values, so the reference
      // must start from the same representation
      Array.fill(dim)(
        (math.rint((center + rnd.nextGaussian() * 0.05) * 1000) / 1000).toFloat.toDouble)
    }
  }

  test("distributed refinement equals the driver-side quantized reference") {
    val vecs = fixture(300, 8)
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    val init = vecs.take(4).map(_.clone())
    val got = Ivf.lloydRefine(df, init, iters = 3)
    val ref = refRefine(vecs, init, iters = 3)
    assert(got.map(_.toSeq).toSeq == ref.map(_.toSeq).toSeq)
    // and it is invariant under input partitioning (rounded means)
    val rep = Ivf.lloydRefine(df.repartition(7), init, iters = 3)
    assert(rep.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq)
  }

  test("driver-side lloydRefineLocal equals the distributed lloydRefine on the same rows") {
    // the bounded-sample refinement path (refineCentroids) must be the
    // SAME function as the distributed passes it replaced — identical
    // quantized assignment, empty-cell rule, 1e-9 mean rounding
    val vecs = fixture(300, 8)
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    val init = vecs.take(4).map(_.clone())
    val dist = Ivf.lloydRefine(df, init, iters = 3)
    val local = Ivf.lloydRefineLocal(vecs, init, iters = 3)
    assert(local.map(_.toSeq).toSeq == dist.map(_.toSeq).toSeq)
    // empty-cell stability carries over
    val vecs2 = Array.fill(20)(Array(1.0, 1.0)) ++ Array.fill(20)(Array(-1.0, -1.0))
    val init2 = Array(Array(1.0, 1.0), Array(-1.0, -1.0),
      Array(9.0, 9.0), Array(-9.0, -9.0))
    val got2 = Ivf.lloydRefineLocal(vecs2, init2, iters = 2)
    assert(got2(2).toSeq == Seq(9.0, 9.0) && got2(3).toSeq == Seq(-9.0, -9.0))
  }

  test("refinement never increases quantized inertia over the init assignment") {
    val vecs = fixture(300, 8)
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    val init = vecs.take(4).map(_.clone())
    val refined = Ivf.lloydRefine(df, init, iters = 5)
    def inertia(cents: Array[Array[Double]]): Double =
      vecs.map(v => qdist(v, cents(qassign(v, cents))).toDouble).sum
    assert(inertia(refined) <= inertia(init),
      s"refinement worsened inertia: ${inertia(init)} -> ${inertia(refined)}")
    // the blobby fixture must actually improve, not just hold
    assert(inertia(refined) < inertia(init) * 0.9)
  }

  test("kmeans‖ init is deterministic and repartition-invariant") {
    val vecs = fixture(400, 8)
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    val a = Ivf.kmeansParInit(df, k = 4, l = 8, rounds = 3)
    val b = Ivf.kmeansParInit(df.repartition(7), k = 4, l = 8, rounds = 3)
    val c = Ivf.kmeansParInit(df, k = 4, l = 8, rounds = 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "partitioning must not change the selected candidates or the refit")
    assert(a.map(_.toSeq).toSeq == c.map(_.toSeq).toSeq, "rerun must be identical")
    assert(a.length == 4)
  }

  test("kmeans‖ + refine lands within 1.2x of full driver k-means inertia on blobs") {
    val vecs = fixture(400, 8)
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    val par = Ivf.lloydRefine(df, Ivf.kmeansParInit(df, k = 3, l = 6, rounds = 3), iters = 2)
    val full = Ivf.kmeans(vecs, k = 3, iters = 10)
    def inertia(cents: Array[Array[Double]]): Double =
      vecs.map(v => qdist(v, cents(qassign(v, cents))).toDouble).sum
    assert(inertia(par) <= inertia(full) * 1.2,
      s"kmeans‖ init must be competitive: par=${inertia(par)} full=${inertia(full)}")
  }

  test("weighted refit respects weights: zero-weight candidates never seed or pull") {
    // 3 heavy points + 1 zero-weight outlier: init = the 2 heaviest, and
    // the outlier must not move any mean
    val pts = Array(Array(1.0, 0.0), Array(-1.0, 0.0), Array(0.9, 0.1), Array(50.0, 50.0))
    val w = Array(10L, 10L, 5L, 0L)
    val got = Ivf.weightedKmeans(pts, w, k = 2, iters = 5)
    assert(got.forall(c => math.abs(c(0)) <= 1.5 && math.abs(c(1)) <= 1.5),
      s"zero-weight outlier leaked into the centroids: ${got.map(_.toSeq).toSeq}")
  }

  test("prototypesKeep: keepFrac=1 keeps everything; 0.5 keeps ceil(n_c/2) of each cluster, hardest first") {
    val vecs = fixture(300, 8)
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    val cents = Ivf.kmeans(vecs, 4)
    val all = graft.sim.SimilarityQueries.prototypesKeep(df, cents, keepFrac = 1.0)
    assert(all.count() == 300, "keepFrac=1 must keep every vector")
    val half = graft.sim.SimilarityQueries.prototypesKeep(df, cents, keepFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byCell = all.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._2)
    byCell.foreach { case (cell, members) =>
      val kept = half.filter(_._2 == cell)
      assert(kept.length == math.ceil(members.length / 2.0).toInt,
        s"cell $cell: ${kept.length} of ${members.length}")
      // the kept set is exactly the farthest-from-prototype half
      // (ties by vec_id): every kept distance >= every dropped distance
      val keptIds = kept.map(_._1).toSet
      val dropped = members.filterNot(m => keptIds(m._1))
      if (kept.nonEmpty && dropped.nonEmpty)
        assert(kept.map(_._3).min >= dropped.map(_._3).max,
          s"cell $cell kept a nearer vector over a farther one")
    }
  }

  test("cells that lose every vector keep their previous centroid") {
    // 2 distinct points, k=4: two cells stay empty through every pass
    val vecs = Array.fill(20)(Array(1.0, 1.0)) ++ Array.fill(20)(Array(-1.0, -1.0))
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    val init = Array(Array(1.0, 1.0), Array(-1.0, -1.0),
      Array(9.0, 9.0), Array(-9.0, -9.0))
    val got = Ivf.lloydRefine(df, init, iters = 2)
    assert(got(0).toSeq == Seq(1.0, 1.0) && got(1).toSeq == Seq(-1.0, -1.0))
    assert(got(2).toSeq == Seq(9.0, 9.0) && got(3).toSeq == Seq(-9.0, -9.0),
      "empty cells must keep their init centroids")
  }
}
