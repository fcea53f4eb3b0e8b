package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.binning.BinAxis

/** Distributional pin for the seeded jittered histogram
  * (`hist_1d_jitter`, the reference's anti-moiré pre-binning dither,
  * `applyJitter` at `fprocessing.py:1849-1870`): the query is
  * nondeterministic by design so it carries no SQL oracle, but its
  * OUTPUT DISTRIBUTION is tightly constrained — uniform jitter of
  * amplitude h = amp·step moves every event by strictly less than h,
  * so each bin's count must land inside a hard combinatorial envelope
  * of the unjittered data, and the whole histogram must track the
  * exact per-event crossing-probability expectation (χ² check).
  */
class JitterSpec extends AnyFunSuite {
  import SparkTestSession._

  // must mirror the query's parameters (EventQueries: axValue, amp=0.5)
  private val ax = BinAxis("value", 100, 0.0, 500.0)
  private val h = 0.5 * ax.step

  test("jittered histogram stays inside the amp-bounded envelope and matches the χ² expectation") {
    val values = Tables.events(spark, sfDir)
      .select("value").collect().map(_.getDouble(0))
    val jit = SparkEntry.queries("hist_1d_jitter")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // ---- hard per-bin envelope: an event at x with jitter u ∈ [-h, h)
    // is GUARANTEED in bin [lo, hi) iff x ∈ [lo+h, hi-h], and CAN reach
    // it only if x ∈ (lo-h, hi+h) — no correct jitter implementation
    // can leave this band, whatever the RNG draws
    (0 until ax.nbins).foreach { b =>
      val lo = ax.lo + b * ax.step
      val hi = lo + ax.step
      val floor = values.count(v => v >= lo + h && v <= hi - h)
      val ceil = values.count(v => v > lo - h && v < hi + h)
      val got = jit.getOrElse(b.toLong, 0L)
      assert(floor <= got && got <= ceil,
        s"bin $b: count $got outside envelope [$floor, $ceil]")
    }

    // ---- total mass: only events within h of the range edges can
    // enter or leave [lo, hi), so the in-range total moves by at most
    // the population of those two boundary shells
    val baseTotal = values.count(v => v >= ax.lo && v < ax.hi)
    val shell = values.count(v =>
      (v > ax.lo - h && v < ax.lo + h) || (v > ax.hi - h && v < ax.hi + h))
    val jitTotal = jit.values.sum
    assert(math.abs(jitTotal - baseTotal) <= shell,
      s"total $jitTotal vs $baseTotal moved more than the $shell boundary events")

    // ---- χ² against the exact expectation: uniform jitter spreads each
    // event's unit mass uniformly over [x-h, x+h), so E[count(b)] is the
    // summed overlap of those intervals with the bin — the jittered
    // histogram is a sum of independent Bernoulli draws around it, and
    // χ²/df far above 1 would flag a wrong amplitude or a biased RNG
    val exp = new Array[Double](ax.nbins)
    values.foreach { v =>
      val b0 = math.floor((v - h - ax.lo) / ax.step).toInt
      val b1 = math.floor((v + h - ax.lo) / ax.step).toInt
      (b0 to b1).foreach { b =>
        if (b >= 0 && b < ax.nbins) {
          val blo = ax.lo + b * ax.step
          val ov = math.min(v + h, blo + ax.step) - math.max(v - h, blo)
          if (ov > 0) exp(b) += ov / (2 * h)
        }
      }
    }
    val dfBins = (0 until ax.nbins).filter(b => exp(b) > 5.0)
    val chi2 = dfBins.map { b =>
      val o = jit.getOrElse(b.toLong, 0L).toDouble
      (o - exp(b)) * (o - exp(b)) / exp(b)
    }.sum
    assert(dfBins.nonEmpty, "fixture must populate bins")
    assert(chi2 / dfBins.size < 4.0,
      s"chi2/df = ${chi2 / dfBins.size} over ${dfBins.size} bins — " +
        "jitter distribution deviates from the amp-bounded uniform model")

    // ---- and the dither is real: the jittered histogram must differ
    // from the unjittered one somewhere
    val base = SparkEntry.queries("hist_1d")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until ax.nbins).exists(b =>
      jit.getOrElse(b.toLong, 0L) != base.getOrElse(b.toLong, 0L)))
  }
}
