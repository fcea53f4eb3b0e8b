package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Standard relational surface (SURVEY.md §2.3, §2.5–2.8): joins, windows,
  * sorts, set ops, grouping sets, scalar functions. The reference gets
  * none of these from its own engine; we get them from Catalyst — these
  * queries pin down that the surface works and stays oracle-exact.
  *
  * Oracle-exactness policy: any cross-row float aggregation goes through
  * exact integer arithmetic (`round(x * 100) :: long` cents-scaling)
  * because double summation order differs between engines. Per-row double
  * arithmetic is IEEE-identical and needs no rounding. All top-k /
  * windowed queries carry unique tiebreakers so ordering is total.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Exact cents of a money expression: round(x*100) as long. */
  private def cents(c: org.apache.spark.sql.Column) = round(c * lit(100)).cast("long")

  val queries: Map[String, Q] = Map(
    "q1_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(10000)).cast("long")).as("sum_disc_e4"),
          count(lit(1)).as("count_order"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_extendedprice")).as("max_price"))
    },

    "q3_top_orders" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      // small dim side broadcast; at 100 TB customer-filter stays broadcastable
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(o("o_orderkey"), o("o_orderdate"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(10000)).cast("long")).as("revenue_e4"))
        .select(col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("odate_epoch"), col("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("o_orderkey"))
        .limit(10)
    },

    "q5_nation_revenue" -> { (s, dir) =>
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val cu = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(cu, o("o_custkey") === cu("c_custkey"))
        .join(broadcast(n), cu("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(10000)).cast("long")).as("revenue_e4"),
          count(lit(1)).as("n_items"))
    },

    "semi_join" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir).filter(col("l_quantity") >= 49)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"))
    },

    // customers with no high-value order — the > 300000 predicate keeps
    // the result non-empty (every sf0.01 customer has SOME order, so an
    // unconditioned anti-join verified nothing)
    "anti_join" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    "window_topn" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    },

    "window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir)
        .filter(col("l_suppkey") <= 3)
        .withColumn("running_qty", sum(col("l_quantity").cast("long")).over(w))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
    },

    "sort_topk" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(20)
    },

    "set_ops" -> { (s, dir) =>
      val custN = Tables.customer(s, dir).select(col("c_nationkey").as("nk")).distinct()
      val suppN = Tables.supplier(s, dir).select(col("s_nationkey").as("nk")).distinct()
      custN.union(suppN).distinct().select(lit("union").as("tag"), col("nk"))
        .unionByName(custN.intersect(suppN).select(lit("intersect").as("tag"), col("nk")))
        .unionByName(custN.except(suppN).select(lit("except").as("tag"), col("nk")))
    },

    "rollup_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("cnt"), col("sum_qty"))
    },

    "distinct_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    },

    "scalar_string" -> { (s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"),
        element_at(split(col("p_type"), " "), 1).as("type_head"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pre"))
    },

    "date_ops" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("sum_cents"))
    },

    "case_expr" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
    },

    "cube_agg" -> { (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), sum(cents(col("o_totalprice"))).as("sum_cents"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("cnt"), col("sum_cents"))
    },

    // wide pivot: order counts and cent totals per status, one column
    // pair per priority — Spark's pivot() with the pivot values given
    // EXPLICITLY (an implicit pivot pays a distinct-values collect
    // first and is non-deterministic in column order; at scale the
    // value list is a driver literal, as here)
    "pivot_agg" -> { (s, dir) =>
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus").as("status"))
        .pivot("o_orderpriority", prios)
        .agg(count(lit(1)).as("cnt"), sum(cents(col("o_totalprice"))).as("cents"))
        .select(Seq(col("status")) ++ prios.zipWithIndex.flatMap { case (p, i) =>
          Seq(coalesce(col(s"$p" + "_cnt"), lit(0L)).as(s"p${i + 1}_cnt"),
            coalesce(col(s"$p" + "_cents"), lit(0L)).as(s"p${i + 1}_cents"))
        }: _*)
    },

    // correlated scalar subquery: orders above their customer's average
    "scalar_subquery" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val avgByCust = o.groupBy(col("o_custkey").as("ck"))
        .agg((sum(cents(col("o_totalprice"))) / count(lit(1))).as("avg_cents"))
      o.join(avgByCust, col("o_custkey") === col("ck"))
        .filter(cents(col("o_totalprice")) > col("avg_cents"))
        .select(col("o_orderkey"), col("o_custkey"))
    },

    "union_all_rows" -> { (s, dir) =>
      // appendRow parity (fprocessing.py:2413-2433): bag union of frames
      val a = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice"))
      val b = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("o_totalprice"))
      a.unionByName(b)
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        |  count(*) AS count_order,
        |  min(l_quantity) AS min_qty,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT o.o_orderkey,
        |  CAST(epoch(o.o_orderdate) AS BIGINT) AS odate_epoch,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderkey, o.o_orderdate
        |ORDER BY revenue_e4 DESC, o.o_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT r.r_name, n.n_name,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer cu ON o.o_custkey = cu.c_custkey
        |JOIN nation n ON cu.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name""".stripMargin,

    "semi_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)""".stripMargin,

    "anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE c.c_custkey = o.o_custkey AND o.o_totalprice > 300000.0)""".stripMargin,

    "window_topn" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3""".stripMargin,

    "window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 3""".stripMargin,

    "sort_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,

    "pivot_agg" -> {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val cols = prios.zipWithIndex.flatMap { case (p, i) =>
        Seq(
          s"CAST(count(CASE WHEN o_orderpriority = '$p' THEN 1 END) AS BIGINT) AS p${i + 1}_cnt",
          s"CAST(coalesce(sum(CASE WHEN o_orderpriority = '$p' " +
            s"THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS p${i + 1}_cents")
      }
      s"""SELECT o_orderstatus AS status,
         |  ${cols.mkString(",\n  ")}
         |FROM orders GROUP BY o_orderstatus""".stripMargin
    },

    "set_ops" ->
      """SELECT 'union' AS tag, nk FROM (
        |  SELECT DISTINCT c_nationkey AS nk FROM customer
        |  UNION SELECT DISTINCT s_nationkey AS nk FROM supplier) u
        |UNION ALL
        |SELECT 'intersect' AS tag, nk FROM (
        |  SELECT DISTINCT c_nationkey AS nk FROM customer
        |  INTERSECT SELECT DISTINCT s_nationkey AS nk FROM supplier) i
        |UNION ALL
        |SELECT 'except' AS tag, nk FROM (
        |  SELECT DISTINCT c_nationkey AS nk FROM customer
        |  EXCEPT SELECT DISTINCT s_nationkey AS nk FROM supplier) e""".stripMargin,

    "rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "scalar_string" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_up,
        |  regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  substr(p_name, 1, 5) AS name_pre
        |FROM part""".stripMargin,

    "date_ops" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "case_expr" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |  WHEN o_totalprice < 200000 THEN 'medium'
        |  ELSE 'large' END AS bucket, count(*) AS cnt
        |FROM orders GROUP BY 1""".stripMargin,

    "cube_agg" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS prio,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "scalar_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) > (
        |  SELECT CAST(sum(CAST(round(i.o_totalprice * 100) AS BIGINT)) AS BIGINT) / count(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin,

    "union_all_rows" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000""".stripMargin
  )
}
