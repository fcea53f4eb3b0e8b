package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.config.InstrumentConfig

class ConfigSpec extends AnyFunSuite {
  import SparkTestSession._

  test("aperture/lens-mode dims materialize and round-trip as parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg").toString
    InstrumentConfig.writeDims(spark, dir)
    val ap = InstrumentConfig.loadAperture(spark, dir)
    val lm = InstrumentConfig.loadLensMode(spark, dir)
    assert(ap.count() == InstrumentConfig.apertureRows.length)
    assert(lm.count() == InstrumentConfig.lensModeRows.length)
    // two validity generations; ca rows carry no y window
    assert(ap.select("valid_from").distinct().count() == 2)
    assert(ap.filter(col("kind") === "ca" && col("y_lo").isNotNull).count() == 0)
    // spot-check a fa window (reference fprocessing.py:52: 750 at 2018)
    val fa750 = ap.filter(col("kind") === "fa" && col("size_label") === "750" &&
        year(col("valid_from")) === 2018).collect()(0)
    assert(fa750.getDouble(3) == -3.0 && fa750.getDouble(4) == -1.4)
    // spot-check a lens mode voltage (fprocessing.py:83-88)
    val m = lm.filter(col("mode") === "6kV_kmodem4.0_20VTOF_v3.sav").collect()(0)
    assert(m.getDouble(m.fieldIndex("A")) == 420.07)
    assert(m.getDouble(m.fieldIndex("MCPfront")) == 20.0)
  }

  test("config_asof literal lookup == generic asofJoin on the same schedule") {
    import spark.implicits._
    val got = SparkEntry.queries("config_asof")(spark, sfDir)
      .select("event_id", "fa_size").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got.nonEmpty)
    // the same selection through the generic union+window as-of join
    // (constant key — fine at test scale, the reason the query itself
    // uses the literal lookup instead)
    val sched = InstrumentConfig.calibrationSchedule
      .map { case (e, fa, _) => (1, new java.sql.Timestamp(e * 1000L), fa) }
      .toDF("k", "ts", "fa")
    val ev = Tables.events(spark, sfDir).withColumn("k", lit(1))
    val viaAsof = graft.ops.TemporalQueries
      .asofJoin(ev, sched, "k", "ts", "fa", "fa_size")
      .select("event_id", "fa_size").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == viaAsof)
    // schedule actually discriminates: more than one config generation hit
    assert(got.values.flatten.toSet.size > 1)
  }
}
