package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time queries over the `events` stream table (batch view).
  *
  * The reference plumbs event time but never exposes it
  * (`StreamSourceContexts.java:41-47` is ProcessingTime-only, SURVEY §0.2);
  * here the `ts` column + time windows are first-class. The same
  * expressions run under Structured Streaming with `withWatermark` — see
  * graft.streaming.
  */
object TimeQueries {
  import CoreQueries.dsum

  /** Exact per-row running decimal sum — the order-insensitive-within-
    * prefix analog of dsum for window frames. */
  private val byUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** DuckDB-side view of `events` with ts truncated ns→us exactly as the
    * Spark side does (Tables.events) — ordering, lags, and window bucket
    * edges must see identical instants on both engines. */
  private val EVENTS_US =
    "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events"

  val all: Map[String, GraftQuery] = Map(

    // ---- T5 running reduce, per-ELEMENT emission trace: the reference
    // emits the updated aggregate on every input (StreamGroupedReduce.java:
    // 48-52, incl. first element L50-53). The batch-queryable view of that
    // trace is a cumulative window aggregate: one output row per input row,
    // carrying the running per-key state at that element.
    "q_running_reduce" -> GraftQuery.sql(
      "running per-key reduce: cumulative sum at every element (T5 trace)",
      s"""SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_sum,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS n_so_far
        |FROM $EVENTS_US""".stripMargin) { (spark, dir) =>
      val frame = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(spark, dir).events
        .select(
          col("event_id"), col("user_id"),
          sum(col("value").cast("decimal(28,6)")).over(frame)
            .cast("double").as("running_sum"),
          count(lit(1)).over(frame).as("n_so_far"))
    },

    // ---- lag/delta analytics (inter-event gaps per key).
    "q_lag_delta" -> GraftQuery.sql(
      "per-key lag: value delta and seconds since previous event",
      s"""SELECT event_id, user_id,
        |  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_delta,
        |  CAST(date_diff('microseconds',
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS BIGINT) AS micros_since
        |FROM $EVENTS_US""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .select(
          col("event_id"), col("user_id"),
          (col("value") - lag(col("value"), 1).over(byUser)).as("value_delta"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)))
            .as("micros_since"))
    },

    // ---- event funnel: the per-user transition matrix (prev event type
    // → next event type, adjacency by event time) with exact dwell-time
    // sums — the product-analytics primitive behind conversion funnels
    // and session flow diagrams. One shuffle on user_id for the ordered
    // window; the transition aggregate is algebraic and lands on
    // |types|² rows, so at 100 TB the output is constant-size no matter
    // the event volume. Dwell sums stay in integer microseconds —
    // engine-exact, no FP time arithmetic. Ordering ties break on
    // event_id, so both engines walk identical sequences.
    "q_funnel" -> GraftQuery.sql(
      "per-user event-transition matrix with exact dwell-time sums",
      s"""WITH t AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type,
        |    CAST(date_diff('microseconds',
        |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
        |      AS BIGINT) AS dwell_us
        |  FROM $EVENTS_US)
        |SELECT prev_type, event_type AS next_type, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(dwell_us) AS BIGINT) AS total_dwell_us
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .select(col("user_id"), col("event_type"),
          lag(col("event_type"), 1).over(byUser).as("prev_type"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)))
            .as("dwell_us"))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("dwell_us")).as("total_dwell_us"))
        .withColumnRenamed("event_type", "next_type")
    },

    // ---- cohort retention: users bucketed by first-seen hour, counted
    // by how many hours later they return (the retention-curve primitive
    // behind every DAU/WAU and activation dashboard). Two shuffles, both
    // on user_id: the first-seen aggregate and the activity join — at
    // 100 TB both co-partition on the same key so the join is
    // exchange-free after the aggregate. Ages are exact integer hours
    // from truncated timestamps (no calendar FP), and the output is
    // cohorts × ages — tiny at any event volume.
    "q_cohort_retention" -> GraftQuery.sql(
      "first-seen-hour cohorts x activity age in hours -> active users",
      s"""WITH f AS (
        |  SELECT user_id, time_bucket(INTERVAL '1 hour', MIN(ts)) AS cohort
        |  FROM $EVENTS_US GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT events.user_id, f.cohort,
        |    CAST(date_diff('hour', f.cohort,
        |      time_bucket(INTERVAL '1 hour', events.ts)) AS BIGINT) AS age_h
        |  FROM $EVENTS_US JOIN f USING (user_id))
        |SELECT cohort, age_h, COUNT(*) AS n_users
        |FROM act GROUP BY cohort, age_h""".stripMargin) { (spark, dir) =>
      val events = Tables(spark, dir).events
      val first = events.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("cohort"))
      events.select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .join(first, "user_id")
        .select(col("user_id"), col("cohort"),
          expr("(unix_micros(h) - unix_micros(cohort)) div 3600000000")
            .as("age_h"))
        .distinct()
        .groupBy(col("cohort"), col("age_h"))
        .agg(count(lit(1)).as("n_users"))
    },

    // ---- tumbling window aggregate (absent in reference §2.4 — no
    // WindowedStream exists; here: window() in batch, same expr streams).
    "q_tumbling_window" -> GraftQuery.sql(
      "1-hour tumbling windows per event_type",
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM $EVENTS_US GROUP BY win_start, event_type""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value"))
    },

    // ---- sliding window (10 min length, 5 min slide): each event lands in
    // 2 windows. Oracle replicates Spark's epoch-aligned window grid by
    // unioning the two candidate buckets.
    "q_sliding_window" -> GraftQuery.sql(
      "10-minute windows sliding every 5 minutes",
      s"""SELECT win_start, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start, value, ts FROM $EVENTS_US
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value, ts FROM $EVENTS_US)
        |WHERE ts >= win_start AND ts < win_start + INTERVAL '10 minutes'
        |GROUP BY win_start""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
        .select(col("window.start").as("win_start"), col("n"), col("sum_value"))
    },

    // ---- session window (30-min gap) per user. Oracle: classic
    // gaps-and-islands. Session start/count/sum are gap-semantics-exact.
    "q_session_window" -> GraftQuery.sql(
      "session windows with 30-minute inactivity gap per user",
      s"""WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM $EVENTS_US WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("sum_value"))
        .select(col("session_window.start").as("session_start"),
          col("user_id"), col("n_events"), col("sum_value"))
    },

    // ---- manual gaps-and-islands sessionization: unlike session_window
    // (above) this assigns an explicit per-user session ID to every event
    // (lag -> boundary flag -> running sum), which is what a pipeline
    // needs when downstream ops key on the session. Both window passes
    // share the SAME (user_id) partitioning and (ts, event_id) sort, so
    // Spark plans ONE exchange+sort for the wide data; the final
    // (user_id, session_id) aggregate combines map-side first, so its
    // exchange only carries session-level partial rows.
    "q_sessionize" -> GraftQuery.sql(
      "explicit session IDs via lag + running sum; per-session duration",
      s"""WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM $EVENTS_US WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id, COUNT(*) AS n_events,
        |  CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
        |FROM sess GROUP BY user_id, sid""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val newSess = when(
        lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) >
            1800L * 1000000L,
        1L).otherwise(0L)
      Tables(spark, dir).events
        .select(col("user_id"), col("ts"), col("event_id"), newSess.as("new_s"))
        .select(col("user_id"), col("ts"),
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).as("session_id"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("duration_us"))
    }
  )
}
