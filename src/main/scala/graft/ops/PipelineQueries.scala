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

    // multimodal frame sampling + strided downsample: pure byte slicing
    // over the binary payload (every 3rd 16-byte frame; stride-4 byte
    // sum per frame) — the codec-free video frame-sample/resize plumbing
    "mm_frame_sample" -> { (s, dir) =>
      graft.multimodal.Multimodal.frameSample(
        graft.multimodal.Multimodal.payloads(s, dir))
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
        |FROM documents""".stripMargin,

    // hex-string slicing is the cross-engine byte-exact view of the
    // payload (DuckDB cannot slice blobs directly; hex(blob) can be
    // sliced char-wise with 2 chars per byte, identically to Spark's
    // binary substring + hex)
    "mm_frame_sample" ->
      """WITH p AS (
        |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS nb
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, h, unnest(range(0, CAST(nb // 16 AS INT))) AS i
        |  FROM p WHERE nb >= 16)
        |SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  substring(h, CAST(i * 32 + 1 AS INT), 32) AS frame_hex,
        |  CAST(list_sum(list_transform(range(0, 4),
        |    b -> CAST(concat('0x', substring(h, CAST(i * 32 + b * 8 + 1 AS INT), 2)) AS BIGINT))) AS BIGINT) AS strided_sum
        |FROM idx WHERE i % 3 = 0""".stripMargin
  )
}
