package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.binning.BinAxis

/** Structured Streaming surface (SURVEY.md §2.9). The reference has no
  * streaming engine — its events are batch rows with a reconstructed
  * `timeStamps` column — but the N-D histogram aggregate is algebraic
  * (commutative monoid), so it runs unchanged under a watermark: late
  * events beyond the watermark are dropped, the same semantics as the
  * out-of-range bin drop.
  */
object StreamOps {

  /** Schema of the events table as needed for `readStream` (streaming
    * sources require an explicit schema; ts arrives as raw nanos since
    * the files carry TIMESTAMP(NANOS), see Tables.events). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Streaming event source from a directory of parquet files (file
    * streaming sources monitor directories; point it at a drop folder).
    */
  def readEvents(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsRawSchema)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Windowed streaming histogram: per (tumbling time window, bin) counts
    * with a watermark — the streaming form of the core binning operator.
    */
  def streamingHistogram(events: DataFrame, axis: BinAxis,
                         windowLen: String = "1 minute",
                         watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .filter(axis.pred(col("value")))
      .groupBy(window(col("ts"), windowLen).as("w"),
        axis.bin(col("value")).as(s"bin_${axis.name}"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("w.start")).as("w_start"),
        col(s"bin_${axis.name}"), col("cnt"))

  /** Batch-equivalent of [[streamingHistogram]] for oracle comparison
    * (complete-mode streaming result == batch result on the same data). */
  def batchHistogram(events: DataFrame, axis: BinAxis,
                     windowLen: String = "1 minute"): DataFrame =
    events
      .filter(axis.pred(col("value")))
      .groupBy(window(col("ts"), windowLen).as("w"),
        axis.bin(col("value")).as(s"bin_${axis.name}"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("w.start")).as("w_start"),
        col(s"bin_${axis.name}"), col("cnt"))
}
