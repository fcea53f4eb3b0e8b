package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-pattern utilities (SURVEY.md §4.2 / the 100 TB checklist):
  * skew-salted joins and bucketed co-located joins. These are the two
  * shuffle-taming tools AQE cannot always provide on its own (AQE
  * handles *detected* skew post-hoc; salting handles known-skewed keys
  * up front; bucketing removes the shuffle entirely for repeated joins
  * on the same key).
  */
object Scale {

  /** Skew-salted equi-join: replicate each right row `saltFactor` times
    * and scatter left rows uniformly across the salt space, so one hot
    * key spreads over `saltFactor` reducers instead of one.
    *
    * Correct for 1:N joins where `right` is the small/deduped side
    * (each left row still matches its right row exactly once).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1)
    // right/full outer would surface each unmatched right row once per
    // salt replica — those join types are incorrect under salting
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi joins, not $joinType")
    val saltCol = "_graft_salt"
    require(!left.columns.contains(saltCol) && !right.columns.contains(saltCol),
      s"inputs must not already contain a $saltCol column")
    // salt must be a DETERMINISTIC function of row content: a salt from
    // monotonically_increasing_id (or rand) changes across task retries,
    // which silently loses/duplicates rows through the shuffle
    // (the SPARK-23207 failure class)
    val saltedLeft = left.withColumn(saltCol,
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val saltedRight = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(saltedRight, Seq(key, saltCol), joinType).drop(saltCol)
  }

  /** Write `df` bucketed+sorted by the join key and register it as
    * `table` in the session catalog; joins between two tables bucketed
    * the same way run as SortMergeJoin over pre-bucketed scans with no
    * shuffle exchange.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** True if the physical plan of `df` contains a shuffle exchange
    * (hash, range, or single-partition — broadcast exchanges are not
    * shuffles and don't count). */
  def hasShuffle(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    Seq("Exchange hashpartitioning", "Exchange rangepartitioning", "Exchange SinglePartition")
      .exists(plan.contains)
  }

  /** True if the physical plan funnels all rows into one partition —
    * the single-task global-window/global-sort scale-killer (an
    * `Exchange SinglePartition` feeding WindowExec/SortExec). Used by
    * ScaleSpec to assert the partition-and-stitch rewrites stay
    * partition-parallel. */
  def hasSinglePartitionExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange SinglePartition")
}
