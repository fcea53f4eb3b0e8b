package graft

import org.scalatest.funsuite.AnyFunSuite

/** BenchLarge regression gate (VERDICT r5 #2): the committed
  * BENCH_LARGE.json parses into sizes + per-query seconds, and the
  * comparison flags a seeded slowdown past tolerance, flags a query
  * that silently dropped out of the run, and ignores newly added
  * measurements that have no baseline yet. Pure-function pins — the
  * 100M-row main exercises the same code path end to end.
  */
class BenchGateSpec extends AnyFunSuite {

  private val sampleJson =
    """{"metric":"bench_large","value":49.28,"unit":"sec","rows":100000000,""" +
      """"docs":2000000,"vecs":2000000,"events_per_sec":36327157,""" +
      """"queries":{"hist_3d_rel":3.39,"hist_3d_shard":2.12,"lsh_pairs":35.65,""" +
      """"cc_clusters":3.57,"ivf_topk":4.54},""" +
      """"outputs":{"hist_3d_rel":100000000,"lsh_pairs":624439}}"""

  test("parseBaseline reads sizes and per-query seconds from the committed format") {
    val b = BenchLarge.parseBaseline(sampleJson)
    assert(b.rows === 100000000L)
    assert(b.docs === 2000000L)
    assert(b.vecs === 2000000L)
    assert(b.queries.size === 5)
    assert(b.queries("lsh_pairs") === 35.65)
    assert(b.queries("hist_3d_shard") === 2.12)
  }

  test("the committed BENCH_LARGE.json itself parses (merges must not break the gate)") {
    val p = java.nio.file.Paths.get("BENCH_LARGE.json")
    assume(java.nio.file.Files.exists(p))
    val b = BenchLarge.parseBaseline(new String(
      java.nio.file.Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
    assert(b.queries.nonEmpty && b.rows > 0 && b.docs > 0 && b.vecs > 0)
    assert(b.calib.nonEmpty && b.calibStr.nonEmpty,
      "the calibrated gate needs both kernel times in the committed baseline")
    assert(b.queries.values.forall(_ > 0))
  }

  test("a seeded slowdown past tolerance fails the gate, naming the query") {
    val base = Map("hist_3d_rel" -> 3.0, "lsh_pairs" -> 30.0)
    val fresh = Map("hist_3d_rel" -> 3.2, "lsh_pairs" -> 60.0) // 2x seeded
    val regs = BenchLarge.regressions(base, fresh, tol = 1.5)
    assert(regs.size === 1)
    assert(regs.head.startsWith("lsh_pairs:"))
  }

  test("runs within tolerance pass") {
    val base = Map("a" -> 2.0, "b" -> 4.0)
    val fresh = Map("a" -> 2.9, "b" -> 3.1) // 1.45x and faster
    assert(BenchLarge.regressions(base, fresh, tol = 1.5).isEmpty)
  }

  test("a query measured by the baseline but missing from the run fails the gate") {
    val base = Map("a" -> 2.0, "b" -> 4.0)
    val regs = BenchLarge.regressions(base, Map("a" -> 2.0), tol = 1.5)
    assert(regs.size === 1)
    assert(regs.head.startsWith("b:"))
  }

  test("regressions() ignores a measurement with no baseline — the MAIN's unsealed check owns that failure") {
    // two-level contract: the regressions() primitive compares only
    // baseline-covered entries (so an ONLY-mode partial run can reuse
    // it safely), while the full-run gate in main() separately fails on
    // timed-but-unsealed entries (results minus baseline keys) — the
    // class that let simhash_incr run ungated for three rounds.
    val base = Map("a" -> 2.0)
    val fresh = Map("a" -> 2.0, "brand_new" -> 100.0)
    assert(BenchLarge.regressions(base, fresh, tol = 1.5).isEmpty)
    assert((fresh.keySet -- base.keySet) == Set("brand_new"))
  }

  test("exactly at tolerance is not a regression (strict inequality)") {
    val base = Map("a" -> 2.0)
    assert(BenchLarge.regressions(base, Map("a" -> 3.0), tol = 1.5).isEmpty)
  }

  test("a uniformly slower host passes once calibration scales the budget") {
    // whole machine 2.5x slower: every query 2.5x, calibration 2.5x
    val base = Map("a" -> 2.0, "b" -> 30.0)
    val fresh = Map("a" -> 5.0, "b" -> 75.0)
    assert(BenchLarge.regressions(base, fresh, tol = 1.5,
      baseCalib = Some(1.0), freshCalib = Some(2.5)).isEmpty)
  }

  test("a code regression still fails when calibration says the host is unchanged") {
    val base = Map("a" -> 2.0, "b" -> 30.0)
    val fresh = Map("a" -> 2.0, "b" -> 75.0) // only b slowed — that's code
    val regs = BenchLarge.regressions(base, fresh, tol = 1.5,
      baseCalib = Some(1.0), freshCalib = Some(1.0))
    assert(regs.size === 1)
    assert(regs.head.startsWith("b:"))
  }

  test("a query that outgrew even the host-scaled budget fails") {
    // host 2x slower but the query is 4x slower: 4 > 1.5 * 2
    val base = Map("b" -> 30.0)
    val regs = BenchLarge.regressions(base, Map("b" -> 120.0), tol = 1.5,
      baseCalib = Some(1.0), freshCalib = Some(2.0))
    assert(regs.size === 1)
  }

  test("a faster host never SHRINKS budgets (scale clamped to >= 1)") {
    // host 2x faster but the query carries fixed driver-side overheads
    // and only dropped 10%: unclamped scaling would demand
    // 2.0 * 1.5 * 0.5 = 1.5 s and flag 1.8 s as a false regression
    val base = Map("a" -> 2.0)
    assert(BenchLarge.regressions(base, Map("a" -> 1.8), tol = 1.5,
      baseCalib = Some(2.0), freshCalib = Some(1.0)).isEmpty)
  }

  test("absent calibration on either side falls back to absolute comparison") {
    val base = Map("a" -> 2.0)
    val fresh = Map("a" -> 5.0)
    assert(BenchLarge.regressions(base, fresh, tol = 1.5,
      baseCalib = None, freshCalib = Some(2.5)).size === 1)
    assert(BenchLarge.regressions(base, fresh, tol = 1.5,
      baseCalib = Some(1.0), freshCalib = None).size === 1)
  }

  test("parseBaseline reads the optional calib field") {
    val withCalib = sampleJson.replace(""""queries"""", """"calib":1.23,"queries"""")
    assert(BenchLarge.parseBaseline(withCalib).calib === Some(1.23))
    assert(BenchLarge.parseBaseline(sampleJson).calib === None)
  }

  test("the string calibration kernel relaxes budgets when it reads worse than numeric") {
    // host weather hits string workloads 2.5x but the numeric kernel
    // only 1.1x (the observed r9 pattern): the gate must scale by the
    // WORSE kernel, or string-heavy queries fail on pure weather
    val base = Map("a" -> 10.0)
    val fresh = Map("a" -> 22.0) // 2.2x — inside 1.5 x 2.5, outside 1.5 x 1.1
    assert(BenchLarge.regressions(base, fresh, tol = 1.5,
      baseCalib = Some(1.0), freshCalib = Some(1.1)).nonEmpty,
      "numeric-only calibration must flag this")
    assert(BenchLarge.regressions(base, fresh, tol = 1.5,
      baseCalib = Some(1.0), freshCalib = Some(1.1),
      baseCalibStr = Some(1.0), freshCalibStr = Some(2.5)).isEmpty,
      "the string kernel's scale must relax the budget")
    // and the max is relax-only: a FASTER string kernel never shrinks
    assert(BenchLarge.regressions(Map("a" -> 10.0), Map("a" -> 14.0), tol = 1.5,
      baseCalib = Some(1.0), freshCalib = Some(1.0),
      baseCalibStr = Some(2.0), freshCalibStr = Some(1.0)).isEmpty)
  }

  test("parseBaseline reads the optional calib_str field") {
    val withBoth = sampleJson.replace(""""queries"""",
      """"calib":1.23,"calib_str":2.34,"queries"""")
    assert(BenchLarge.parseBaseline(withBoth).calibStr === Some(2.34))
    assert(BenchLarge.parseBaseline(sampleJson).calibStr === None)
  }

  test("parseBaseline reads per-entry seals and min_outputs; absent fields stay empty") {
    val withSeals = sampleJson.replace(""""queries"""",
      """"calib":1.13,"calib_str":1.68,""" +
        """"seals":{"lsh_pairs":[1.59, 2.24]},""" +
        """"min_outputs":{"ivf_recall_p1":700000},"queries"""")
    val b = BenchLarge.parseBaseline(withSeals)
    assert(b.seals === Map("lsh_pairs" -> (1.59, 2.24)))
    assert(b.minOutputs === Map("ivf_recall_p1" -> 700000L))
    val plain = BenchLarge.parseBaseline(sampleJson)
    assert(plain.seals.isEmpty && plain.minOutputs.isEmpty)
  }

  test("a per-entry seal normalizes ITS budget — a loud-sealed entry is not gated against the quiet file stamp") {
    // entry sealed at calib_str 3.35 on a loud host; fresh run at 2.0.
    // Against the file-level quiet stamp (1.68) the scale would be
    // 2.0/1.68 = 1.19 and 1.5x budgets on the LOUD-sealed time carry
    // ~2x hidden slack; against its own seal the scale clamps to 1.0
    // and the budget is exactly 1.5x the number as measured.
    val base = Map("editdist" -> 14.74)
    val seals = Map("editdist" -> (1.33, 3.35))
    // 24.0 s fails the seal-normalized budget (14.74 * 1.5 * 1.0 + 1.0
    // grace = 23.11)...
    assert(BenchLarge.regressions(base, Map("editdist" -> 24.0), tol = 1.5,
      baseCalib = Some(1.13), freshCalib = Some(1.2),
      baseCalibStr = Some(1.68), freshCalibStr = Some(2.0),
      seals = seals).nonEmpty,
      "seal-normalized: 24.0 > 14.74 * 1.5 * 1.0 + 1.0 must flag")
    // ...while WITHOUT the seal the same number hides inside the
    // file-stamp-scaled budget (14.74 * 1.5 * (2.0/1.68) + 1.0 = 27.3)
    assert(BenchLarge.regressions(base, Map("editdist" -> 24.0), tol = 1.5,
      baseCalib = Some(1.13), freshCalib = Some(1.2),
      baseCalibStr = Some(1.68), freshCalibStr = Some(2.0)).isEmpty,
      "file-stamp scaling hides the same slowdown — the slack seals remove")
    // and a quiet-sealed entry on a loud fresh window still relaxes:
    // seal (1.13, 1.68), fresh str 3.36 -> scale 2.0
    assert(BenchLarge.regressions(Map("q" -> 5.0), Map("q" -> 13.0), tol = 1.5,
      baseCalib = Some(1.13), freshCalib = Some(1.2),
      baseCalibStr = Some(1.68), freshCalibStr = Some(3.36),
      seals = Map("q" -> (1.13, 1.68))).isEmpty)
  }

  test("min_outputs gates committed output floors: a recall drop fails like a time regression") {
    val base = Map("ivf_recall_p1" -> 10.0)
    val regs = BenchLarge.regressions(base, Map("ivf_recall_p1" -> 9.0),
      tol = 1.5, minOutputs = Map("ivf_recall_p1" -> 700000L),
      freshOutputs = Map("ivf_recall_p1" -> 650000L))
    assert(regs.size === 1 && regs.head.contains("floor"), regs.mkString("; "))
    // at or above the floor passes
    assert(BenchLarge.regressions(base, Map("ivf_recall_p1" -> 9.0),
      tol = 1.5, minOutputs = Map("ivf_recall_p1" -> 700000L),
      freshOutputs = Map("ivf_recall_p1" -> 700000L)).isEmpty)
    // ONLY-mode partial runs: a floor whose entry wasn't measured is
    // not flagged by the primitive (the full-run gate is never called
    // with partial coverage)
    assert(BenchLarge.regressions(base, Map("ivf_recall_p1" -> 9.0),
      tol = 1.5, minOutputs = Map("ivf_recall_p1" -> 700000L),
      freshOutputs = Map.empty).isEmpty)
  }

  test("the additive grace covers fixed overheads on tiny entries without masking seconds-scale regressions") {
    // a 0.62 s map-only entry measured 3.26 s on a calib_str-4.17
    // window (scale 2.48): multiplicative budget 2.31 flags pure
    // weather, the +1 s grace clears it...
    assert(BenchLarge.regressions(Map("cdc_chunks" -> 0.62),
      Map("cdc_chunks" -> 3.26), tol = 1.5,
      baseCalibStr = Some(1.68), freshCalibStr = Some(4.17),
      baseCalib = Some(1.13), freshCalib = Some(1.45)).isEmpty)
    // ...while a REAL 4x regression on a quiet window still fails
    // (grace capped at base: 0.62 * 1.5 + 0.62 = 1.55 < 2.5)
    assert(BenchLarge.regressions(Map("cdc_chunks" -> 0.62),
      Map("cdc_chunks" -> 2.5), tol = 1.5,
      baseCalibStr = Some(1.68), freshCalibStr = Some(1.68),
      baseCalib = Some(1.13), freshCalib = Some(1.13)).nonEmpty)
    // grace = 0 restores the pure multiplicative gate
    assert(BenchLarge.regressions(Map("cdc_chunks" -> 0.62),
      Map("cdc_chunks" -> 3.26), tol = 1.5,
      baseCalibStr = Some(1.68), freshCalibStr = Some(4.17),
      baseCalib = Some(1.13), freshCalib = Some(1.45),
      graceSec = 0.0).nonEmpty)
  }

  test("the grace is capped at base*scale: a tiny entry keeps a meaningful multiplicative gate on quiet windows") {
    // MASKING BOUND: grace_eff = min(graceSec, base*scale). Under a
    // flat +1 s, a 0.3 s entry regressing 4x to 1.2 s on a QUIET
    // window (scale 1.0) passed (budget 0.45 + 1.0 = 1.45); with the
    // cap its grace is 0.3 s and the budget 0.75 s — the 4x flags.
    assert(BenchLarge.regressions(Map("tiny" -> 0.3),
      Map("tiny" -> 1.2), tol = 1.5,
      baseCalibStr = Some(1.68), freshCalibStr = Some(1.68),
      baseCalib = Some(1.13), freshCalib = Some(1.13)).nonEmpty,
      "a 4x regression on a 0.3 s entry at scale 1.0 must flag")
    // an in-budget tiny entry (worst-case quiet budget base*(tol+1) =
    // 0.75 s) still clears
    assert(BenchLarge.regressions(Map("tiny" -> 0.3),
      Map("tiny" -> 0.7), tol = 1.5,
      baseCalibStr = Some(1.68), freshCalibStr = Some(1.68),
      baseCalib = Some(1.13), freshCalib = Some(1.13)).isEmpty)
    // the loud-window additive-overhead case the grace exists for
    // (cdc_chunks, scale 2.48) keeps its full 1 s grace because
    // base*scale = 1.54 > graceSec — both directions hold at once
    assert(BenchLarge.regressions(Map("cdc_chunks" -> 0.62),
      Map("cdc_chunks" -> 3.26), tol = 1.5,
      baseCalibStr = Some(1.68), freshCalibStr = Some(4.17),
      baseCalib = Some(1.13), freshCalib = Some(1.45)).isEmpty,
      "the loud-window fixed-overhead case must still pass under the cap")
  }

  test("Bench ONLY-mode writes to a *_only.json path — a partial run never overwrites the full artifact") {
    assert(Bench.outPathFor("bench_out.json", onlyMode = false) === "bench_out.json")
    assert(Bench.outPathFor("bench_out.json", onlyMode = true) === "bench_out_only.json")
    assert(Bench.outPathFor("/tmp/b.json", onlyMode = true) === "/tmp/b_only.json")
    assert(Bench.outPathFor("custom_out", onlyMode = true) === "custom_out_only")
  }

  test("Bench mode tags are self-describing: only runs tagged only, warm runs tagged only+warm, full runs untagged") {
    assert(Bench.modeTags(onlyMode = false, warm = false) === "")
    assert(Bench.modeTags(onlyMode = true, warm = false) === "\"only\":true,")
    assert(Bench.modeTags(onlyMode = true, warm = true) ===
      "\"only\":true,\"warm\":true,")
    // warm-without-only is rejected by the main (a full run self-warms)
    // — the tag helper never emits a bare warm tag in practice, but its
    // output stays parseable if it ever did
    assert(Bench.modeTags(onlyMode = false, warm = true) === "\"warm\":true,")
  }

  test("Bench tail-proof lines: per-query records stay under 1 KB and the compact total line is bounded and map-free") {
    // the driver keeps a bounded stdout tail; BENCH_r15/r16 lost the
    // ~7 KB full line to it (parsed: null). The contract restored here:
    // each per-query record is its own short line, and the LAST stdout
    // line is a compact total without the per-query map.
    val pq = Bench.perQueryLine("dedup_substring_chars_incr", 123.456789012)
    assert(pq === """{"q":"dedup_substring_chars_incr","sec":123.456789012}""")
    assert(pq.length < 1024, "a per-query line must fit any bounded tail")
    // longest registered name today is ~26 chars; even a 100-char name
    // with a full-precision double stays far under the bound
    assert(Bench.perQueryLine("x" * 100, 1.23456789012345e-4).length < 1024)
    val cl = Bench.compactLine(186.25, 204, "", "[]", "/root/testdata/sf0.1")
    assert(cl ===
      """{"metric":"total","value":186.25,"unit":"sec","n":204,"failures":[],"sf":"/root/testdata/sf0.1"}""")
    assert(cl.length < 2000, "the compact line must fit the driver's tail whole")
    // mode tags thread through so a partial run's compact line is
    // self-describing too
    assert(Bench.compactLine(1.0, 2, "\"only\":true,", "[]", "sf") ===
      """{"metric":"total","value":1.0,"unit":"sec","only":true,"n":2,"failures":[],"sf":"sf"}""")
  }

  test("the committed seals map only names committed queries, and floors only name committed entries") {
    val p = java.nio.file.Paths.get("BENCH_LARGE.json")
    assume(java.nio.file.Files.exists(p))
    val b = BenchLarge.parseBaseline(new String(
      java.nio.file.Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
    val orphanSeals = b.seals.keySet -- b.queries.keySet
    assert(orphanSeals.isEmpty, s"seals for unknown queries: $orphanSeals")
    val orphanFloors = b.minOutputs.keySet -- b.queries.keySet
    assert(orphanFloors.isEmpty, s"floors for unknown queries: $orphanFloors")
    b.seals.values.foreach { case (c, s) =>
      assert(c > 0 && s > 0, "seal calib pairs must be positive")
    }
  }
}
