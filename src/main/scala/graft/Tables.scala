package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading helpers for the driver-generated parquet test tables
  * (TESTDATA.md). At cluster scale these would be partitioned parquet
  * directories; the API shape is identical (`spark.read.parquet` on a
  * path), so everything downstream scales without change.
  */
object Tables {
  /** Read one named table from an sf directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` normalizes to a microsecond TimestampType column (UTC
    * session) regardless of how the driver generated the parquet:
    * TIMESTAMP(NANOS) — which Spark 4 rejects unless read as raw nanos
    * via the legacy conf, set here so it holds under any driver-created
    * session — converts ns→µs; TIMESTAMP_MICROS without UTC adjustment
    * reads as TIMESTAMP_NTZ and casts to the same wall-clock instants
    * under the UTC session; an adjusted-to-UTC file is already the
    * target type. DuckDB's view of the same file matches in all three
    * layouts.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
