package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scale

class ScaleSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed dataset") {
    // 90% of left rows share one hot key
    val left = (1 to 20000).map(i => (if (i % 10 == 0) i % 50 else 7L, i.toLong))
      .toDF("k", "v")
    val right = (0 until 50).map(k => (k.toLong, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).agg(count(lit(1)), sum($"v".cast("long")))
      .collect()(0)
    val salted = Scale.saltedJoin(left, right, "k", saltFactor = 8)
      .agg(count(lit(1)), sum($"v".cast("long"))).collect()(0)
    assert(plain == salted)
    // left outer also supported
    val lo = Scale.saltedJoin(left, right.filter($"k" < 5), "k", 8, "left")
    assert(lo.count() == left.count())
  }

  test("bucketed tables join without a shuffle exchange") {
    val s2 = spark
    val prevThreshold = s2.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
    val o = Tables.orders(s2, sfDir)
    val l = Tables.lineitem(s2, sfDir)
    Scale.writeBucketed(o.select($"o_orderkey", $"o_totalprice"), "o_orderkey", 8, "orders_b")
    Scale.writeBucketed(l.select($"l_orderkey", $"l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", 8, "lineitem_b")
    val joined = s2.table("orders_b").join(s2.table("lineitem_b"), "o_orderkey")
    assert(!Scale.hasShuffle(joined), "bucketed join must not shuffle:\n" +
      joined.queryExecution.executedPlan.toString.take(2000))
    // and the join is still correct
    val expect = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
    assert(joined.count() == expect)
    // the same join on raw (unbucketed) frames DOES shuffle under SMJ
    val raw = o.select($"o_orderkey").join(
      l.select($"l_orderkey").withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
    assert(Scale.hasShuffle(raw))
    } finally {
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s2.sql("DROP TABLE IF EXISTS orders_b")
      s2.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
