package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.warp.Warp

/** Distortion-correction applied distributively: the broadcast
  * deformation-field lookup (`tps_matrix` correction, reference
  * `base.py:530-539`) and direct columnar TPS evaluation (reference
  * `dask_tps.py:42-97`), plus regex-numeric sort and event-range select
  * (SURVEY.md §2.6).
  */
object WarpQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic synthetic warp used to build the deformation field —
    * closed-form so the DuckDB oracle can evaluate the same function
    * directly (the engine-side lookup exercises the real broadcast-array
    * mechanics). */
  private def warpFn(x: Double, y: Double): (Double, Double) =
    (x + 5.0 * math.sin(y / 50.0), y - 3.0 * math.cos(x / 80.0))

  private val GRID = 512

  /** Fixed TPS control points (src → dst) for the columnar TPS query. */
  private val tpsSrc = Array((100.0, 40.0), (400.0, 40.0), (100.0, 160.0), (400.0, 160.0), (250.0, 100.0))
  private val tpsDst = Array((103.0, 42.0), (398.0, 38.0), (99.0, 163.0), (405.0, 158.0), (252.0, 101.0))

  val queries: Map[String, Q] = Map(
    // inverse-deformation-field lookup via a flat 2·512·512 float array.
    // This is the reference's tps_matrix momentum correction: newX =
    // dfield[0][int(x)][int(y)] — run as ONE native codegen'd expression
    // (graft.functions.DfieldLookup) that reads both corrected
    // coordinates per row, replacing the former pair of boxed Scala UDFs.
    "dfield_lookup" -> { (s, dir) =>
      val field = Warp.deformationField(GRID, warpFn)
      val flat = new Array[Float](2 * GRID * GRID)
      for (c <- 0 until 2; x <- 0 until GRID)
        System.arraycopy(field(c)(x), 0, flat, c * GRID * GRID + x * GRID, GRID)
      def look(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        org.apache.spark.sql.GraftBridge.column(graft.functions.DfieldLookup(
          org.apache.spark.sql.GraftBridge.expression(x),
          org.apache.spark.sql.GraftBridge.expression(y), flat, GRID))
      Tables.events(s, dir)
        .filter(col("value") >= 0 && col("value") < GRID &&
          col("user_id") >= 0 && col("user_id") < GRID)
        .withColumn("w", look(col("value"), col("user_id").cast("double")))
        .select(col("event_id"), col("w.xm").as("xm"), col("w.ym").as("ym"))
    },

    // columnar TPS evaluation: w·U(r²) folded into pure Column math —
    // the weights are solved once on the driver and baked in as
    // literals, so the hot path is whole-stage-codegen arithmetic.
    "tps_apply" -> { (s, dir) =>
      val tps = Warp.tpsFit(tpsSrc, tpsDst)
      val x = col("value"); val y = col("user_id").cast("double")
      val n = tpsSrc.length
      def eval(w: Array[Double]) = {
        val affine = lit(w(n)) + lit(w(n + 1)) * x + lit(w(n + 2)) * y
        tpsSrc.zipWithIndex.map { case ((cx, cy), i) =>
          val r2 = (x - lit(cx)) * (x - lit(cx)) + (y - lit(cy)) * (y - lit(cy))
          lit(w(i)) * when(r2 > 0, lit(0.5) * r2 * log(r2)).otherwise(lit(0.0))
        }.foldLeft(affine)(_ + _)
      }
      Tables.events(s, dir).select(col("event_id"),
        round(eval(tps.wx), 6).as("xw"), round(eval(tps.wy), 6).as("yw"))
    },

    // regex-numeric sort (sortNamesBy, fprocessing.py:232-269)
    "sort_regex" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"),
          regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int").as("brand_num"))
        .orderBy(col("brand_num"), col("p_partkey"))
        .limit(30)
    },

    // event-range select by sequence position (fprocessing.py:1163-1166):
    // global row numbers from per-chunk counts + driver offsets
    // (Stitch.globalSeq) — chunks outside [101, 200] are pruned before
    // any window runs, so the scan touches a vanishing fraction at scale
    "event_range" -> { (s, dir) =>
      Stitch.globalSeq(Tables.events(s, dir),
        expr("unix_timestamp(ts) div 3600"),
        Seq(col("ts"), col("event_id")), lo = 101, hi = 200)
        .select(col("seq").cast("int").as("seq"), col("event_id"))
    }
  )

  val oracles: Map[String, String] = {
    val tps = Warp.tpsFit(tpsSrc, tpsDst)
    val n = tpsSrc.length
    def evalSql(w: Array[Double]): String = {
      val affine = s"${w(n)} + ${w(n + 1)} * value + ${w(n + 2)} * CAST(user_id AS DOUBLE)"
      val terms = tpsSrc.zipWithIndex.map { case ((cx, cy), i) =>
        val r2 = s"((value - $cx) * (value - $cx) + (CAST(user_id AS DOUBLE) - $cy) * (CAST(user_id AS DOUBLE) - $cy))"
        s"${w(i)} * (CASE WHEN $r2 > 0 THEN 0.5 * $r2 * ln($r2) ELSE 0.0 END)"
      }
      (affine +: terms).mkString(" + ")
    }
    Map(
      "dfield_lookup" ->
        s"""SELECT event_id,
           |  CAST(CAST(floor(value) + 5.0 * sin(CAST(user_id AS DOUBLE) / 50.0) AS FLOAT) AS DOUBLE) AS xm,
           |  CAST(CAST(CAST(user_id AS DOUBLE) - 3.0 * cos(floor(value) / 80.0) AS FLOAT) AS DOUBLE) AS ym
           |FROM events
           |WHERE value >= 0 AND value < $GRID AND user_id >= 0 AND user_id < $GRID""".stripMargin,

      "tps_apply" ->
        s"""SELECT event_id,
           |  round(${evalSql(tps.wx)}, 6) AS xw,
           |  round(${evalSql(tps.wy)}, 6) AS yw
           |FROM events""".stripMargin,

      "sort_regex" ->
        """SELECT p_partkey, p_brand,
          |  CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS brand_num
          |FROM part ORDER BY brand_num, p_partkey LIMIT 30""".stripMargin,

      "event_range" ->
        """SELECT seq, event_id FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY ts, event_id) AS INT) AS seq, event_id
          |  FROM events) t
          |WHERE seq BETWEEN 101 AND 200""".stripMargin
    )
  }
}
