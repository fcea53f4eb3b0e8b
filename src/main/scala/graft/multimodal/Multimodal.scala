package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` payloads with a typed metadata struct, processed by a
  * per-partition batched decode/feature-extract stage.
  *
  * The Spark-side mechanics — schema, partition batching, feature
  * extraction shape — are real and tested. The media decode itself is a
  * STUB (this environment ships no image/audio codecs): `decodeStub`
  * computes deterministic byte-level features where a real pipeline
  * would hand the byte buffer to a codec. Swapping in a real decoder
  * changes one function, not the dataflow.
  */
object Multimodal {

  val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("fmt", StringType),
      StructField("n_bytes", IntegerType))))))

  /** Materialize a payload table from `documents` (UTF-8 bytes stand in
    * for encoded media; at 100 TB this column is the dominant I/O, which
    * is why everything downstream is per-partition streaming, never a
    * driver collect). */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("utf8-text").as("fmt"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes")).as("meta"))

  final case class MediaFeatures(doc_id: Long, n_bytes: Int, head_byte: Int,
                                 byte_sum_mod: Long, payload_md5: String)

  /** STUB decode: byte-level features standing in for codec output.
    * A real implementation would decode `bytes` (JPEG/PNG/WAV/...) here
    * and emit embeddings / dimensions / frame samples instead.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Long) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    (if (bytes.nonEmpty) bytes(0) & 0xff else -1, sum % 997L)
  }

  /** Frame sampling over a binary media column — the video-pipeline
    * "every k-th frame" stage as pure Catalyst byte slicing (no UDF, no
    * decode): treat the payload as fixed-size `frameBytes` frames, keep
    * every `everyK`-th, and emit each sampled frame (as hex — the
    * cross-engine byte-exact representation) plus a strided-byte
    * downsample sum (the codec-free "resize" analogue: every
    * `resizeStride`-th byte of the frame, summed). A real pipeline
    * swaps the hex projection for a codec call; the partitioning,
    * explode shape, and byte arithmetic are the production dataflow.
    */
  def frameSample(payloadDf: DataFrame, frameBytes: Int = 16, everyK: Int = 3,
                  resizeStride: Int = 4): DataFrame = {
    val nSamples = frameBytes / resizeStride
    payloadDf
      .withColumn("_idx", expr(
        s"""CASE WHEN octet_length(payload) >= $frameBytes THEN
           |  filter(sequence(0, CAST(octet_length(payload) div $frameBytes AS INT) - 1),
           |         i -> i % $everyK = 0)
           |ELSE CAST(array() AS ARRAY<INT>) END""".stripMargin))
      .select(col("doc_id"), col("payload"), explode(col("_idx")).as("frame_idx"))
      .withColumn("frame_hex",
        expr(s"hex(substring(payload, frame_idx * $frameBytes + 1, $frameBytes))"))
      .withColumn("strided_sum",
        expr(s"""CAST(aggregate(transform(sequence(0, ${nSamples - 1}),
                |  b -> CAST(conv(substring(frame_hex, b * ${resizeStride * 2} + 1, 2), 16, 10) AS BIGINT)),
                |  CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)""".stripMargin))
      .select(col("doc_id"), col("frame_idx"), col("frame_hex"), col("strided_sum"))
  }

  /** Per-partition batched feature extraction (the mapInPandas-shaped
    * stage): iterator-in/iterator-out so each task streams its rows
    * through the decoder without materializing the partition. */
  def extractFeatures(payloadDf: DataFrame): DataFrame = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    // single pass: the payload column is the dominant I/O, so the md5 is
    // computed inside the same partition loop (no second scan, no join)
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val (head, checksum) = decodeStub(bytes)
          val md5hex = digest.digest(bytes).map(b => f"$b%02x").mkString
          (id, bytes.length, head, checksum, md5hex)
        }
      }
      .toDF("doc_id", "n_bytes", "head_byte", "byte_sum_mod", "payload_md5")
  }
}
