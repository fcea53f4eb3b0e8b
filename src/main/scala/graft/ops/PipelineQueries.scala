package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.binning.BinAxis

/** Pipeline-shaped operators: multimodal payload feature extraction and
  * distributed per-trace curve fitting.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // multimodal: binary payload column + per-partition feature stage.
    // Output restricted to oracle-expressible features; byte-level stub
    // features are covered by MultimodalSpec.
    "multimodal_features" -> { (s, dir) =>
      graft.multimodal.Multimodal.extractFeatures(
        graft.multimodal.Multimodal.payloads(s, dir))
        .select(col("doc_id"), col("n_bytes"), col("payload_md5"))
    },

    // distributed gaussian fit of per-event-type value histograms —
    // Dataset[Trace].map(fit) across the cluster. Not SQL-expressible
    // (iterative solver) ⇒ rows-only check; exactness covered by FitSpec.
    "fit_traces_gauss" -> { (s, dir) =>
      val ax = BinAxis("value", 50, 0.0, 500.0)
      val hist = graft.Tables.events(s, dir)
        .filter(ax.pred(col("value")))
        .groupBy(col("event_type"), ax.bin(col("value")).as("bin"))
        .agg(count(lit(1)).as("cnt"))
      graft.fit.Fit.fitTraces(
        graft.fit.Fit.tracesFromHistogram(s, hist, "event_type", "bin", "cnt"))
        .toDF()
    }
  )

  val oracles: Map[String, String] = Map(
    "multimodal_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents""".stripMargin
  )
}
