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
    val saltedLeft = left.withColumn("_salt",
      (pmod(hash(monotonically_increasing_id()), lit(saltFactor))).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * shuffle-free (SortMergeJoin over pre-bucketed scans). Tables are
    * registered as `name_a`/`name_b` in the session catalog.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** True if the physical plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
