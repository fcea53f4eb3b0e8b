package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster-
  * resolution step of near-dup deduplication: LSH/MinHash emit PAIRS,
  * but a dedup pipeline needs CLUSTERS (and one canonical survivor per
  * cluster), i.e. the transitive closure of the pair relation.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each
  * round is two aggregate+join passes over the edge list, no driver-
  * side graph state, converging in O(log n) rounds on real-world
  * graphs. Scale notes:
  *  - no per-node neighbor ARRAY is ever materialized (a component
  *    center can have millions of neighbors — a collect_set there is
  *    one giant row on one reducer); the group minimum comes from an
  *    aggregate JOINED back on the same key, so the groupBy's shuffle
  *    partitioning is reused by the join (one exchange, no skew row);
  *  - the edge list only shrinks (toward stars centered on component
  *    minima), so per-round cost falls as the loop proceeds;
  *  - driver traffic is one (count, checksum) pair per round for the
  *    convergence check. Deterministic (min over ids, no salts/rand).
  *
  *  - large-star: every neighbor v > u links to m = min(N(u) ∪ {u}) —
  *    long chains shortcut toward small ids.
  *  - small-star: grouping each canonical edge by its GREATER
  *    endpoint, the center and its lesser neighbors all link to the
  *    group minimum — flattening small-id tangles into stars.
  */
object Components {

  /** (src, dst) pair list → (node, component) labels, component = the
    * minimum node id reachable. Nodes with no surviving edge (isolated
    * or self-paired only) are absent — callers union in singletons if
    * they need total coverage.
    *
    * Job-count note (measured, closed wontfix): each round launches two
    * blocking jobs — the `localCheckpoint` materialization and the
    * convergence-signature aggregate over the already-materialized
    * RDD. That is a fixed driver-side cost per round, independent of
    * edge count: at 625k pairs with an 1100-node clique the full
    * resolution runs in ~3.5 s (BENCH_LARGE.json `cc_clusters`, now
    * regression-gated), and with O(log n) rounds the per-round launch
    * overhead shrinks relative to shuffle work as data grows — the
    * opposite of a scale risk. Fusing signature into the checkpoint
    * would save <0.5 s at any scale while complicating convergence.
    */
  def connectedComponents(pairs: DataFrame, src: String, dst: String,
                          maxIter: Int = 50): DataFrame = {
    // canonical undirected edge set (u < v), self-loops dropped
    // localCheckpoint (not persist): each round's plan would otherwise
    // embed every previous round's, and Catalyst re-analysis of the
    // growing tree dominates wall-clock after a handful of iterations —
    // checkpointing truncates the lineage to the materialized RDD
    var edges = pairs
      .select(least(col(src), col(dst)).as("u"), greatest(col(src), col(dst)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(hash(col("u"), col("v")).cast("long"))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prevSig = signature(edges)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // ---- large-star over both edge directions: m(u) joined back on u
      val nbrs = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min(col("v")).as("minv"))
      // m <= u < v, so (m, v) is already canonical and never a loop
      val large = nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(least(col("u"), col("minv")).as("u"), col("v"))
        .distinct()

      // ---- small-star: group canonical edges by the greater endpoint c;
      // its lesser neighbors and c itself all link to the group min
      val byCenter = large.select(col("v").as("c"), col("u").as("n")) // n < c
      val cmins = byCenter.groupBy("c").agg(min(col("n")).as("m"))
      val small = byCenter.join(cmins, "c")
        .filter(col("n") =!= col("m"))
        .select(col("m").as("u"), col("n").as("v"))
        .union(cmins.select(col("m").as("u"), col("c").as("v")))
        .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
        .distinct()
        .localCheckpoint()

      val nextSig = signature(small)
      converged = nextSig == prevSig
      prevSig = nextSig
      edges = small
      iter += 1
    }

    // fixpoint is a forest of stars (u = component min, v = member):
    // members map to the center, the center maps to itself
    edges.select(col("v").as("node"), col("u").as("component"))
      .union(edges.select(col("u").as("node"), col("u").as("component")))
      .groupBy("node").agg(min(col("component")).as("component"))
  }

  /** Total labeling over a node universe: [[connectedComponents]] plus a
    * self-labeled row for every node of `nodes` that never appears in a
    * surviving edge (isolated / self-paired only) — the "union
    * singletons" step for callers that need an EXPLICIT label per node
    * (cluster statistics, per-doc provenance columns).
    *
    * NOT the dedup materialization path: producing the deduplicated
    * corpus itself never needs universe-wide labels — survivors are
    * "everything minus the small drop-set", so
    * [[graft.text.TextQueries.dedupKeep]]'s broadcast anti-join (the
    * canonical path, singletons never join at all) does the same
    * coverage with no universe-sized join. TextQueriesSpec pins the two
    * paths to the same survivor set so they cannot drift.
    *
    * Scale: one left join of the universe against the (much smaller)
    * pair-participant labels on the node key; nodes outside the
    * universe that DO appear in pairs keep their labels (union
    * semantics, not an inner restriction).
    */
  def connectedComponentsTotal(pairs: DataFrame, src: String, dst: String,
                               nodes: DataFrame, nodeCol: String,
                               maxIter: Int = 50): DataFrame = {
    val cc = connectedComponents(pairs, src, dst, maxIter)
    val universe = nodes.select(col(nodeCol).as("node")).distinct()
    universe.join(cc, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
      .union(cc.join(universe, Seq("node"), "left_anti"))
  }
}
