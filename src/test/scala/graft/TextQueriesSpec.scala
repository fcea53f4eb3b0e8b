package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextQueries
import graft.ops.Components

/** Survivor-policy and singleton-path pins for the dedup
  * materialization step ([[TextQueries.dedupKeep]]).
  */
class TextQueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def keepSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val labelMap: Map[Long, Long] = {
    val pairs = TextQueries.queries("dedup_lsh_pairs")(spark, sfDir)
      .select(col("d1"), col("d2"))
    Components.connectedComponents(pairs, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("explicit keepBy=doc_id ascending equals the default min-doc_id fast path") {
    val fast = keepSet(TextQueries.dedupKeep(docs))
    val generic = keepSet(TextQueries.dedupKeep(docs, keepBy = Some(col("doc_id"))))
    assert(labelMap.nonEmpty, "fixture must produce clusters")
    assert(generic == fast)
  }

  test("quality-keyed survivor policy keeps the best doc per cluster (longest text)") {
    val got = keepSet(TextQueries.dedupKeep(docs,
      keepBy = Some(length(col("text"))), ascending = false))
    // driver-side expectation: per cluster keep max length, ties to the
    // smaller doc_id; singletons (never labeled) always survive
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val survivors = labelMap.groupBy(_._2).values.map { members =>
      members.keys.maxBy(id => (lens(id), -id))
    }.toSet
    val expected = (lens.keySet -- labelMap.keySet) ++ survivors
    assert(got == expected)
    assert(got.size == keepSet(TextQueries.dedupKeep(docs)).size,
      "policy changes WHICH doc survives, never HOW MANY")
  }

  test("dedup_keep survivors == connectedComponentsTotal self-labeled set (singleton-path parity)") {
    // the canonical broadcast-anti path and the explicit total-labeling
    // API must agree on the survivor set — pinned so the two singleton
    // paths cannot drift (total labels: every doc gets a row; survivors
    // are exactly the self-labeled ones)
    val pairs = TextQueries.queries("dedup_lsh_pairs")(spark, sfDir)
      .select(col("d1"), col("d2"))
    val total = Components.connectedComponentsTotal(pairs, "d1", "d2", docs, "doc_id")
    val viaTotal = total.filter(col("node") === col("component"))
      .select(col("node")).collect().map(_.getLong(0)).toSet
    val viaAnti = keepSet(SparkEntry.queries("dedup_keep")(spark, sfDir))
    assert(total.count() == docs.count(), "total labeling must cover the universe")
    assert(viaAnti == viaTotal)
  }
}

/** Harness-integrity pins for the driver-contract dump main. */
class VerifySpec extends AnyFunSuite {
  import SparkTestSession._

  test("Verify.main fails loudly on unknown query names before any work") {
    spark // force the shared session so Verify.main joins it
    val out = java.nio.file.Files.createTempDirectory("graft_verify_bad").toString
    val e = intercept[IllegalArgumentException] {
      Verify.main(Array(sfDir, out, "case_expr", "no_such_query"))
    }
    assert(e.getMessage.contains("no_such_query"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/oracle_sql.json")),
      "a failed run must not leave a partial oracle dump")
  }

  test("filtered Verify.main dumps only the selected queries and oracles") {
    spark
    val out = java.nio.file.Files.createTempDirectory("graft_verify_sel").toString
    Verify.main(Array(sfDir, out, "case_expr", "q1_agg"))
    val written = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(written.contains("case_expr") && written.contains("q1_agg"))
    assert(!written.contains("hist_1d"), s"unselected query dumped: $written")
    val oracles = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    val keys = graft.binning.MetaTree.parse(oracles)
      .asInstanceOf[graft.binning.MetaNode.MObj].fields.map(_._1).toSet
    assert(keys == Set("case_expr", "q1_agg"),
      s"oracle dump must match the selection, got $keys")
    assert(!spark.sparkContext.isStopped,
      "Verify.main must not stop a session it did not create")
  }
}
