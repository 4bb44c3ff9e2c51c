package graft.queries

import graft.{Det, GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-checkable twins of the streaming semantics (SURVEY.md §2.9):
  * event-time sessionization and sliding windows produce identical
  * results in micro-batch and backfill, so the gate verifies them on the
  * batch path while StreamingSpec drives the same operators through
  * MemoryStream micro-batches.
  */
object StreamingQueries {

  /** ST1 — event-time sessionization (gap = 1 day): lag-gap marking +
    * running session counter + per-session aggregate. The batch twin of
    * EventStreams.sessionize.
    */
  val st01Sessionize: GraftQuery = GraftQuery(
    "st01_sessionize",
    """WITH ordered AS (
      |  SELECT user_id, event_id, ts, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |marked AS (
      |  SELECT user_id, event_id, ts, value,
      |         CASE WHEN prev_ts IS NULL
      |                OR date_diff('second', prev_ts, ts) > 86400 THEN 1 ELSE 0 END AS new_sess
      |  FROM ordered),
      |sess AS (
      |  SELECT user_id, ts, value,
      |         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
      |       MIN(ts) AS session_start, MAX(ts) AS session_end,
      |       date_diff('second', MIN(ts), MAX(ts)) AS duration_sec
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val marked = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 86400, 1L)
          .otherwise(0L))
    marked
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        Det.dsum(col("value"), 6).as("sum_value"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("duration_sec"))
      .orderBy("user_id", "session_id")
  }

  /** ST2 — sliding event-time window (2-day window, 1-day slide): every
    * event lands in two epoch-aligned windows; counts + exact sums per
    * window start.
    */
  val st02SlidingWindow: GraftQuery = GraftQuery(
    "st02_sliding_window",
    """WITH expanded AS (
      |  SELECT unnest([date_trunc('day', ts) - INTERVAL 1 DAY, date_trunc('day', ts)]) AS bucket,
      |         value
      |  FROM events)
      |SELECT bucket, COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM expanded GROUP BY bucket ORDER BY bucket""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value"), 6).as("sum_value"))
      .select(col("w.start").as("bucket"), col("n"), col("sum_value"))
      .orderBy("bucket")
  }

  val all: Seq[GraftQuery] = Seq(st01Sessionize, st02SlidingWindow)
}
