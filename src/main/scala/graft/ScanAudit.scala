package graft

import org.apache.spark.sql.SparkSession

/** Redundant-lineage audit main: executes every registered query at a
  * small SF and prints its EXECUTED file-scan count
  * ([[graft.ops.Scale.executedFileScans]]) — one `name count` line per
  * query, sorted. ScanCountSpec pins the full map as a regression gate;
  * this main exists to (re)generate it and to spot-check a single query
  * while iterating (`runMain graft.ScanAudit <sfDir> [query...]`).
  *
  * A count that rises without a declared reason is the
  * redundant-counting-pass bug class: broadcast branches defeat
  * exchange reuse, so a shared aggregate silently re-executes once per
  * derived table unless it is materialized
  * ([[graft.ops.Scale.materializeCompact]]).
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val preexisting = SparkSession.getDefaultSession.isDefined
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        // a catalog cache left by an earlier query would substitute into
        // this query's plan and change its count — clear for determinism
        spark.catalog.clearCache()
        val line = try s"$name ${graft.ops.Scale.executedFileScans(fn(spark, sfDir))}"
        catch { case e: Throwable => s"$name ERROR ${e.getMessage}" }
        println(line)
      }
    if (!preexisting) spark.stop()
  }
}
