package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Components

class ComponentsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def labels(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = spark.createDataFrame(pairs).toDF("a", "b")
    Components.connectedComponents(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two separate components resolve to their minima") {
    val got = labels(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long path (worst case for naive propagation) converges") {
    val n = 64
    val got = labels((0 until n).map(i => (i.toLong, (i + 1).toLong)))
    assert(got.size == n + 1 && got.values.forall(_ == 0L))
  }

  test("bridged cliques merge; self-loops and duplicate edges are ignored") {
    val cliqueA = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 20 to 23; j <- (i + 1) to 23) yield (i.toLong, j.toLong)
    val noise = Seq((3L, 3L), (0L, 1L), (1L, 0L)) // self-loop + dup + reversed dup
    val bridge = Seq((3L, 20L))
    val got = labels(cliqueA ++ cliqueB ++ noise ++ bridge)
    assert(got.size == 8 && got.values.forall(_ == 0L))
  }

  test("star already at fixpoint returns immediately and correctly") {
    val got = labels(Seq((5L, 6L), (5L, 7L), (5L, 8L)))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L))
  }

  test("empty pair list yields empty labels") {
    val df = spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("a", "b")
    assert(Components.connectedComponents(df, "a", "b").collect().isEmpty)
  }

  test("connectedComponentsTotal self-labels singletons, keeps pair nodes, unions out-of-universe") {
    val pairs = spark.createDataFrame(Seq((1L, 2L), (2L, 3L), (40L, 41L))).toDF("a", "b")
    // universe misses 41 (still labeled, union semantics) and adds
    // singletons 7, 9 (self-labeled)
    val nodes = spark.createDataFrame(Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L),
      Tuple1(7L), Tuple1(9L), Tuple1(40L))).toDF("n")
    val got = Components.connectedComponentsTotal(pairs, "a", "b", nodes, "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 9L,
      40L -> 40L, 41L -> 40L))
  }

  test("labels are deterministic under input repartition(k)") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (a, b) => a != b }
    val base = spark.createDataFrame(pairs).toDF("a", "b")
    val want = Components.connectedComponents(base, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (k <- Seq(1, 2, 8)) {
      val got = Components.connectedComponents(base.repartition(k), "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"repartition($k) changed the labeling")
    }
  }

  test("dedup_keep invariant on sf0.001: |keep| + |dropped| = |documents|, keepers are cluster minima") {
    val docs = Tables.documents(spark, sfDir)
    val keep = graft.text.TextQueries.queries("dedup_keep")(spark, sfDir)
    val pairs = graft.text.TextQueries.queries("dedup_lsh_pairs")(spark, sfDir)
      .select(col("d1"), col("d2"))
    val comp = Components.connectedComponents(pairs, "d1", "d2")
    val nDropped = comp.filter(col("node") =!= col("component")).count()
    assert(keep.count() + nDropped == docs.count())
    // every cluster contributes exactly its minimum to the keep set
    val keepIds = keep.select("doc_id").collect().map(_.getLong(0)).toSet
    val byComp = comp.collect().map(r => (r.getLong(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    byComp.foreach { case (c, mn) =>
      assert(mn == c && keepIds.contains(c), s"cluster $c: min $mn")
    }
    assert(comp.filter(col("node") =!= col("component"))
      .collect().forall(r => !keepIds.contains(r.getLong(0))))
  }

  test("random graph matches a driver-side union-find oracle") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    // union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(x => x -> find(x)).toMap
    assert(labels(pairs) == want)
  }
}
