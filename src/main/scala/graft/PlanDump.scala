package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture main for the optimization rounds: writes the
  * `.explain("formatted")` output of named registered queries (or all
  * of them) to `<outDir>/<query>_<tag>.txt`, one file per query —
  * the judge-auditable before/after plan evidence
  * (`plans/r<N>/<query>_before.txt` / `..._after.txt`).
  *
  * Usage: `runMain graft.PlanDump <sfDir> <outDir> <tag> [query...]`
  * The session mirrors graft.Bench's config (same planner inputs →
  * same plan shapes as the timed run).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <tag> [query...]")
    val Array(sfDir, outDir, tag) = args.take(3)
    val only = args.drop(3).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        val path = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(path,
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote $path")
        } catch {
          case e: Throwable => println(s"[plandump] $name ERROR ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
