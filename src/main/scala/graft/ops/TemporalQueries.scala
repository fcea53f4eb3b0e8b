package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.binning.BinAxis

/** Temporal operators beyond simple tumbling windows: sliding windows,
  * as-of joins (the reference's "aperture/lens-mode config by validity
  * timestamp" lookup, SURVEY.md §2.3), and the streaming histogram's
  * batch-equivalent.
  */
object TemporalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Scalable as-of join: for each left row, the latest right row with
    * the same key and ts <= left.ts. Implemented as union + ordered
    * window carry-forward — one shuffle on (key, ts), no broadcast or
    * range-explosion, which is the 100 TB-safe shape (a sort-merge
    * as-of per key).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCol: String, outCol: String): DataFrame = {
    val l = left.withColumn("_side", lit(1)).withColumn("_v", lit(null).cast("double"))
    val r = right.select(col(key), col(ts), col(valueCol).as("_v"))
      .withColumn("_side", lit(0))
    val cols = l.columns.toSeq
    val unioned = l.unionByName(r.select(
      cols.map(c => if (r.columns.contains(c)) col(c) else lit(null).cast(l.schema(c).dataType).as(c)): _*))
    // right rows sort before left rows at equal ts (_side 0 < 1) so a
    // config row taking effect exactly at ts applies to that event
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(outCol, last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_v")
  }

  val queries: Map[String, Q] = Map(
    // as-of join: each event picks up the latest prior purchase value
    // of the same user (config-by-validity-timestamp shape)
    "asof_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      asofJoin(ev, purchases, "user_id", "ts", "value", "asof_value")
        .select(col("event_id"), col("asof_value"))
    },

    // config-by-validity-timestamp selection against the aperture
    // calibration schedule (the reference's aperture_dict datetime-key
    // lookup, fprocessing.py:50-79, dims in config.InstrumentConfig).
    // The dim is a handful of rows, so the 100 TB shape is a driver-
    // literal lookup — idx = #validities <= ts resolved per row inside
    // whole-stage codegen, NO join and NO shuffle (the keyed union+
    // window asofJoin would funnel every event through the dim's few
    // keys; ConfigAsofSpec pins equality between the two mechanisms).
    "config_asof" -> { (s, dir) =>
      val sched = graft.config.InstrumentConfig.calibrationSchedule
      val epochs = typedLit(sched.map(_._1))
      val fas = typedLit(sched.map(_._2))
      val cas = typedLit(sched.map(_._3))
      val u = unix_timestamp(col("ts"))
      Tables.events(s, dir)
        .withColumn("idx", size(filter(epochs, e => e <= u)))
        .select(col("event_id"),
          when(col("idx") > 0, element_at(epochs, col("idx"))).as("config_epoch"),
          when(col("idx") > 0, element_at(fas, col("idx"))).as("fa_size"),
          when(col("idx") > 0, element_at(cas, col("idx"))).as("ca_size"))
    },

    // sliding window: 2-minute windows sliding by 1 minute
    "sliding_window" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "2 minutes", "1 minute").as("w"))
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * lit(100)).cast("long")).as("sum_cents"))
        .select(unix_timestamp(col("w.start")).as("w_start"), col("cnt"), col("sum_cents"))
    },

    // sessionization: per-user session ids from 30-minute inactivity gaps
    // (the lag-window batch form; the stateful streaming form is
    // StreamOps.sessionize, tested via flatMapGroupsWithState)
    "sessionize" -> { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_id"), col("user_id"), col("session_id"))
    },

    // batch-equivalent of the streaming windowed histogram
    "stream_hist_batch" -> { (s, dir) =>
      graft.streaming.StreamOps.batchHistogram(
        Tables.events(s, dir), BinAxis("value", 20, 0.0, 500.0), "1 minute")
    },

    // first-touch conversion funnel (view → click → purchase): per
    // user, the FIRST timestamp of each step; the user reaches step k
    // while the first-touch chain stays strictly increasing. stage =
    // the deepest step reached (0 = never viewed). One map-side-
    // combined user aggregate (min-per-type rides the groupBy) into a
    // 4-row stage count — no window, no self-join, two compact
    // shuffles at any scale.
    "event_funnel" -> { (s, dir) =>
      firstTouchFunnel(Tables.events(s, dir),
        Seq("view", "click", "purchase"))
    },

    // weekly cohort retention: users bucket into their first active
    // epoch-week (cohort) and count as retained in every later week
    // they reappear — the (cohort_week, week_offset, n_users)
    // triangle. One distinct on compact (user, week) pairs, one
    // min-per-user aggregate, one cohort count — all map-side
    // combinable, no window, no self-join.
    "event_retention" -> { (s, dir) =>
      cohortRetention(Tables.events(s, dir))
    }
  )

  /** Weekly cohort-retention triangle over an event stream: distinct
    * (user, epoch-week) activity, each user's first week is the
    * cohort, and every active week counts at its offset. Emits
    * (cohort_week, week_offset, n_users). */
  def cohortRetention(events: DataFrame): DataFrame = {
    val uw = events.select(col("user_id"),
      expr("unix_timestamp(ts) div 604800").as("week")).distinct()
    val fw = uw.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    uw.join(fw, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-touch funnel over an ordered `steps` sequence: per user the
    * FIRST timestamp of each step (one map-side-combined aggregate),
    * stage = the deepest step whose first-touch chain stays strictly
    * increasing (0 = never did step 1), then a steps-sized stage
    * count — no window, no self-join, two compact shuffles. */
  def firstTouchFunnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val aggs = steps.zipWithIndex.map { case (st, i) =>
      min(when(col("event_type") === st, col("ts"))).as(s"t${i + 1}")
    }
    val firsts = events.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
    val stage = steps.indices.foldLeft(when(col("t1").isNull, 0)) {
      case (acc, i) if i > 0 =>
        acc.when(col(s"t${i + 1}").isNull ||
          col(s"t${i + 1}") <= col(s"t$i"), i)
      case (acc, _) => acc
    }.otherwise(steps.length)
    firsts.select(stage.as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
  }

  val oracles: Map[String, String] = Map(
    "asof_join" ->
      """SELECT e.event_id, r.value AS asof_value
        |FROM events e
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |                WHERE event_type = 'purchase') r
        |  ON e.user_id = r.user_id AND e.ts >= r.ts""".stripMargin,

    "config_asof" -> {
      val rows = graft.config.InstrumentConfig.calibrationSchedule
        .map { case (e, fa, ca) =>
          s"(CAST($e AS BIGINT), CAST($fa AS DOUBLE), CAST($ca AS DOUBLE))"
        }.mkString(", ")
      // Spark unix_timestamp floors to the second; validities are whole
      // seconds, so floor(epoch(ts)) >= e <=> ts >= to_timestamp(e)
      s"""WITH sched(config_epoch, fa_size, ca_size) AS (VALUES $rows)
         |SELECT e.event_id, s.config_epoch, s.fa_size, s.ca_size
         |FROM events e
         |ASOF LEFT JOIN sched s
         |  ON CAST(floor(epoch(e.ts)) AS BIGINT) >= s.config_epoch""".stripMargin
    },

    // Spark sliding windows: an event at t belongs to windows starting at
    // floor_minute(t) and floor_minute(t) - 60s (width 2 min, slide 1 min)
    "sliding_window" ->
      """WITH starts AS (
        |  SELECT CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) - off AS w_start,
        |    value
        |  FROM events CROSS JOIN (SELECT unnest([0, 60]) AS off))
        |SELECT w_start, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM starts GROUP BY w_start""".stripMargin,

    "sessionize" ->
      """SELECT event_id, user_id,
        |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN prev_ts IS NULL OR
        |      CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT event_id, user_id, ts,
        |          lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events) t1) t2""".stripMargin,

    "event_funnel" ->
      """WITH f AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN ts END) AS t1,
        |  min(CASE WHEN event_type = 'click' THEN ts END) AS t2,
        |  min(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
        |FROM events GROUP BY user_id)
        |SELECT stage, CAST(count(*) AS BIGINT) AS n_users FROM (
        |  SELECT CASE WHEN t1 IS NULL THEN 0
        |              WHEN t2 IS NULL OR t2 <= t1 THEN 1
        |              WHEN t3 IS NULL OR t3 <= t2 THEN 2
        |              ELSE 3 END AS stage FROM f) t
        |GROUP BY stage""".stripMargin,

    // Spark unix_timestamp floors to the second → floor(epoch(ts));
    // both engines then floor-divide the nonnegative epoch by 604800
    "event_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week FROM events),
        |fw AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id)
        |SELECT fw.cohort_week, uw.week - fw.cohort_week AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM uw JOIN fw USING (user_id)
        |GROUP BY fw.cohort_week, uw.week - fw.cohort_week""".stripMargin,

    "stream_hist_batch" -> {
      val ax = BinAxis("value", 20, 0.0, 500.0)
      s"""SELECT CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) AS w_start,
         |  ${ax.sqlBin("value")} AS bin_value, count(*) AS cnt
         |FROM events WHERE ${ax.sqlPred("value")}
         |GROUP BY 1, 2""".stripMargin
    }
  )
}
