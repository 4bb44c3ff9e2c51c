package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming operators for incremental ingestion (SURVEY.md
  * §2.9): the reference's batch scrape pipeline has resume/checkpoint
  * semantics (cursor files, per-item retry counters, overlap dedup) that
  * map onto watermarks, streaming dedup, and keyed state.
  *
  * Every transform takes/returns a DataFrame so it runs identically on a
  * `readStream` source (micro-batch, checkpointed) and on a batch frame
  * (backfill) — the run-mode decision stays at the edge, like the
  * reference's resumable re-runs.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  /** Tumbling event-time window counts with a watermark for late data
    * (the CT date-chunk ingestion windows, CTConfig.py:5-32, as true
    * event-time windows).
    */
  def windowedTypeCounts(events: DataFrame, watermarkDelay: String, windowDur: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming dedup with watermark-bounded STATE — the scrape-overlap
    * dedup (InstagramFeedScraper.py:220) under continuous ingestion.
    * dropDuplicatesWithinWatermark evicts seen-key state once the
    * watermark passes it; plain dropDuplicates on a non-time key would
    * hold every key ever seen and grow without bound on an infinite
    * stream. (Batch frames fall back to plain dropDuplicates — the
    * watermark API is streaming-only.)
    */
  def dedupWithinWatermark(events: DataFrame, watermarkDelay: String,
                           key: String = "event_id"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(key)
    else events.dropDuplicates(key)

  final case class SessionState(nEvents: Long, totalValue: Double,
                                startMs: Long, lastMs: Long)
  final case class Session(user_id: Long, n_events: Long, total_value: Double,
                           start: Timestamp, end: Timestamp, duration_sec: Long)

  /** Event-time sessionization with keyed state: a user's session closes
    * after `gapSec` of event-time silence (watermark-driven timeout).
    * The keyed-state shape also covers the reference's per-item retry
    * counters (InstagramImageScraper.py:62-70) — state keyed by item,
    * updated per batch, emitted on completion.
    */
  def sessionize(events: Dataset[Event], gapSec: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, batch, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.nEvents, s.totalValue,
              new Timestamp(s.startMs), new Timestamp(s.lastMs),
              (s.lastMs - s.startMs) / 1000))
          } else {
            val evs = batch.toSeq.sortBy(_.ts.getTime)
            val init = state.getOption.getOrElse(
              SessionState(0L, 0.0, evs.head.ts.getTime, evs.head.ts.getTime))
            val next = evs.foldLeft(init) { (s, e) =>
              SessionState(s.nEvents + 1, s.totalValue + e.value,
                math.min(s.startMs, e.ts.getTime), math.max(s.lastMs, e.ts.getTime))
            }
            state.update(next)
            state.setTimeoutTimestamp(next.lastMs + gapSec * 1000)
            Iterator.empty
          }
      }
  }
}
