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
                                valueMicros: Long, startUs: Long, lastUs: Long)
  final case class Session(user_id: Long, n_events: Long, total_value: Double,
                           value_micros: Long, session_start: Timestamp,
                           session_end: Timestamp, duration_sec: Long)

  /** Event-time sessionization with keyed state: a user's session closes
    * after `gapSec` of event-time SILENCE — split both WITHIN a batch
    * (walk the sorted events, close on every gap; a backfill is one giant
    * batch, so intra-batch splitting is what makes stream ≡ batch) and
    * ACROSS batches (watermark-driven event-time timeout flushes the open
    * session). Closed sessions emit immediately; only the open session
    * lives in state, so state is O(1) per user.
    *
    * Gap and duration use floor-second arithmetic (`floor(b) - floor(a) >
    * gap`), matching the batch twin's `unix_timestamp` / `date_diff
    * ('second', ...)` semantics exactly; `value_micros` accumulates
    * `floor(value·1e6)` per event — an order-independent exact long, so
    * stream and batch sums are comparable without float-order caveats.
    *
    * The keyed-state shape also covers the reference's per-item retry
    * counters (InstagramImageScraper.py:62-70) — state keyed by item,
    * updated per batch, emitted on completion.
    */
  def sessionize(events: Dataset[Event], gapSec: Long,
                 watermarkDelay: String = null): Dataset[Session] = {
    import events.sparkSession.implicits._
    // local defs (not object methods): the state closure must not capture
    // the enclosing module, which is not Serializable.
    // Timestamp ⇄ microseconds — Catalyst's native timestamp precision;
    // ms-only state would silently truncate the emitted session bounds.
    def micros(t: Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    def tsOfMicros(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000))
      t.setNanos((Math.floorMod(us, 1000000) * 1000).toInt)
      t
    }
    def close(userId: Long, s: SessionState): Session =
      Session(userId, s.nEvents, s.totalValue, s.valueMicros,
        tsOfMicros(s.startUs), tsOfMicros(s.lastUs),
        Math.floorDiv(s.lastUs, 1000000L) - Math.floorDiv(s.startUs, 1000000L))
    events
      .withWatermark("ts", Option(watermarkDelay).getOrElse(s"$gapSec seconds"))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, batch, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(userId, s))
          } else {
            val evs = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var open = state.getOption
            evs.foreach { e =>
              val us = micros(e.ts)
              val vm = math.floor(e.value * 1e6).toLong
              open match {
                case Some(s)
                    if Math.floorDiv(us, 1000000L) - Math.floorDiv(s.lastUs, 1000000L) <= gapSec =>
                  open = Some(SessionState(s.nEvents + 1, s.totalValue + e.value,
                    s.valueMicros + vm, s.startUs, math.max(s.lastUs, us)))
                case Some(s) =>
                  closed += close(userId, s)
                  open = Some(SessionState(1L, e.value, vm, us, us))
                case None =>
                  open = Some(SessionState(1L, e.value, vm, us, us))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(Math.floorDiv(s.lastUs, 1000L) + gapSec * 1000)
            }
            closed.iterator
          }
      }
  }
}
