package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B profile for the KN-N SCORING pass key derivation (VERDICT r12
  * #6): the shipped form derives w1..wn with n separate
  * `element_at(split(g), i)` expressions per n-gram row; the candidate
  * derives `split(g)` ONCE into an array column and indexes it. If
  * whole-stage codegen's subexpression elimination already CSEs the n
  * split() calls (they collapse into one Project), the two forms cost
  * the same and the shipped spelling stays; if not, the explicit form
  * wins ~(n−1)/n of the split work on the dominant per-row pass.
  *
  * Usage: `runMain graft.KnScoreAb [sfDir] [n] [reps]` — prints one
  * line per variant with min/median wall-clock and summed executor CPU
  * (task-metrics listener), min-of-`reps`.
  */
object KnScoreAb {
  private final class CpuListener extends org.apache.spark.scheduler.SparkListener {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
  }

  /** The scoring chain only (counting pass pre-materialized outside the
    * timed region, exactly like kneserNeyScoreN's `tc`), with the key
    * derivation switchable. */
  private def scoring(docs: DataFrame, tc: DataFrame, n: Int,
                      oneSplit: Boolean): DataFrame = {
    import graft.text.TextQueries
    def wc(from: Int, to: Int): Seq[String] = (from to to).map(i => s"w$i")
    val discount = 0.75
    val sided = tc.select(col("g") +: col("cnt") +:
      (1 to n).map(i => element_at(split(col("g"), " "), i).as(s"w$i")): _*)
    val ctxN = sided.groupBy(wc(1, n - 1).map(col): _*)
      .agg(sum(col("cnt")).as(s"den$n"), count(lit(1)).as(s"ty$n"))
    val bT = scala.collection.mutable.Map(
      (n - 1) -> sided.groupBy(wc(2, n).map(col): _*).agg(count(lit(1)).as(s"t${n - 1}")))
    val midT = scala.collection.mutable.Map.empty[Int, DataFrame]
    for (i <- (n - 1) to 2 by -1) {
      midT(i) = bT(i).groupBy(wc(n - i + 1, n - 1).map(col): _*)
        .agg(sum(col(s"t$i")).as(s"den$i"), count(lit(1)).as(s"ty$i"))
      bT(i - 1) = bT(i).groupBy(wc(n - i + 2, n).map(col): _*)
        .agg(count(lit(1)).as(s"t${i - 1}"))
    }
    val totTy = bT(2).agg(count(lit(1)).cast("double").as("tot_ty"))
    var p: org.apache.spark.sql.Column =
      coalesce(col("t1").cast("double"), lit(0.5)) / col("tot_ty")
    for (i <- 2 until n)
      p = coalesce(
        greatest(coalesce(col(s"t$i"), lit(0L)).cast("double") - discount, lit(0.0)) / col(s"den$i"),
        lit(0.0)) +
        coalesce(lit(discount) * col(s"ty$i") / col(s"den$i"), lit(1.0)) * p
    p = coalesce(
      greatest(coalesce(col("cnt"), lit(0L)).cast("double") - discount, lit(0.0)) / col(s"den$n"),
      lit(0.0)) +
      coalesce(lit(discount) * col(s"ty$n") / col(s"den$n"), lit(1.0)) * p
    var scored = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(TextQueries.ngramArrayExpr(n))).as("g"))
    if (oneSplit) {
      scored = scored.withColumn("gws", split(col("g"), " "))
      for (i <- 1 to n)
        scored = scored.withColumn(s"w$i", element_at(col("gws"), i))
      scored = scored.drop("gws")
    } else {
      for (i <- 1 to n)
        scored = scored.withColumn(s"w$i", element_at(split(col("g"), " "), i))
    }
    scored = scored
      .join(broadcast(tc.select("g", "cnt")), Seq("g"), "left")
      .join(broadcast(ctxN), wc(1, n - 1), "left")
    for (i <- (n - 1) to 2 by -1)
      scored = scored
        .join(broadcast(bT(i)), wc(n - i + 1, n), "left")
        .join(broadcast(midT(i)), wc(n - i + 1, n - 1), "left")
    scored
      .join(broadcast(bT(1)), Seq(s"w$n"), "left")
      .crossJoin(broadcast(totTy))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_transitions"),
        round(avg(-log(p)), 6).as(s"nll_kn$n"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 5
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    // counting pass OUTSIDE the timed region (it is identical in both
    // variants and already single-execution by the r12 fix)
    val tcFull = docs
      .select(split(col("text"), " ").as("toks"))
      .select(explode(expr(graft.text.TextQueries.ngramArrayExpr(n))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
    val tc = graft.ops.Scale.materializeCompact(tcFull)
    tc.count()
    for (oneSplit <- Seq(false, true, false, true)) { // interleaved
      val label = if (oneSplit) "one-split" else "shipped-n-splits"
      val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
      val cpus = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        val l = new CpuListener
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        scoring(docs, tc, n, oneSplit).count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.removeSparkListener(l)
        walls += wall
        cpus += l.cpuNs.get() / 1e9
      }
      println(f"KNAB $label%-18s wall_min=${walls.min}%.3f s  wall_all=${walls.map(w => f"$w%.2f").mkString(",")}  cpu_min=${cpus.min}%.2f s")
    }
    spark.stop()
  }
}
