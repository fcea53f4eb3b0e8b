package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Scale

/** Session-owned pinned-storage accounting ([[Scale.pinnedCount]] /
  * [[Scale.pinnedBytes]] / [[Scale.releaseAllPinned]]): a long-lived
  * ingest session constructing LM queries per corpus version (each
  * construction localCheckpoints vocab-sized frames) or running
  * per-crawl-batch incremental dedup (each call persists candidate/
  * shingle frames) must be able to assert its pinned storage is FLAT
  * between units of work — without `spark.catalog.clearCache()`'s
  * session-wide sweep.
  */
class PinRegistrySpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("N successive LM-query constructions + one sweep leave zero registered pins and zero registered bytes") {
    val c0 = Scale.pinnedCount()
    // each construction materializes the counting pass once (the
    // kneserNeyScoreN discipline) — pins MUST accumulate across
    // versions without a sweep; that is the leak this registry audits
    (1 to 3).foreach { _ =>
      graft.text.TextQueries.unigramScore(docs).limit(5).collect()
    }
    val c1 = Scale.pinnedCount()
    assert(c1 >= c0 + 3, s"expected >= 3 new pins, got ${c1 - c0}")
    assert(Scale.pinnedBytes(spark) > 0L,
      "checkpointed LM frames must report live block-manager bytes")
    val released = Scale.releaseAllPinned()
    assert(released == c1, s"sweep must release every pin: $released of $c1")
    assert(Scale.pinnedCount() == 0)
    // unpersist is async (blocking = false): poll the block manager
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (Scale.pinnedBytes(spark) > 0L && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(Scale.pinnedBytes(spark) == 0L,
      "released pins must not report storage")
  }

  test("releaseCompact on a frame deregisters its pin (no dangling audit entries)") {
    val c0 = Scale.pinnedCount()
    val frame = Scale.materializeCompact(docs.select(col("doc_id")).limit(10))
    assert(Scale.pinnedCount() == c0 + 1)
    Scale.releaseCompact(frame)
    assert(Scale.pinnedCount() == c0,
      "a direct release must remove the registry entry")
  }

  test("scoped release: lshMatchesAgainst pins exactly its three frames under lsh_against and a scoped sweep frees only them") {
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val other = Scale.materializeCompact(docs.select(col("doc_id")).limit(5),
      scope = "pinspec_other")
    val c0 = Scale.pinnedCount(Some("lsh_against"))
    graft.text.TextQueries.lshMatchesAgainst(batch, corpus).count()
    assert(Scale.pinnedCount(Some("lsh_against")) == c0 + 3,
      "the candidate frame and both verification shingle frames")
    assert(Scale.releaseAllPinned(Some("lsh_against")) == c0 + 3)
    assert(Scale.pinnedCount(Some("lsh_against")) == 0)
    // the unrelated scope survived the scoped sweep
    assert(Scale.pinnedCount(Some("pinspec_other")) == 1)
    assert(other.count() == 5)
    Scale.releaseCompact(other)
  }
}
