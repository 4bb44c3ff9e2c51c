package graft

import graft.streaming.{EventStreams, StreamUpsert}
import graft.streaming.EventStreams.Event
import graft.operators.Upsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Multi-batch behavior of the foreachBatch CDC-apply (sm07's gate runs
  * one AvailableNow batch; this drives the store through genuine
  * micro-batch evolution, replay, and crash visibility).
  */
class UpsertStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000)
  private val keys = Seq("user_id")
  private val ver = Seq("ts", "event_id")

  private def snap(store: String) =
    StreamUpsert.readSnapshot(spark, store).get
      .select("user_id", "ts", "event_id", "event_type", "value")
      .as[(Long, Timestamp, Long, String, Double)].collect().toSet

  test("three micro-batches evolve the store; final state = one backfill compaction") {
    implicit val ctx = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("ups_stream").toString + "/snap"
    val mem = MemoryStream[Event]
    val q = mem.toDF()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamUpsert.applyBatch(b.sparkSession, store, b, keys, ver)
      }
      .start()
    try {
      mem.addData(Event(1, ts(10), 1, "click", 1.0), Event(2, ts(20), 2, "view", 2.0))
      q.processAllAvailable()
      assert(StreamUpsert.latestVersion(store).contains(0))
      assert(snap(store) == Set(
        (1L, ts(10), 1L, "click", 1.0), (2L, ts(20), 2L, "view", 2.0)))
      // batch 2: update user 1 (newer), stale row for user 2 (older) — ignored
      mem.addData(Event(3, ts(30), 1, "buy", 3.0), Event(4, ts(5), 2, "view", 9.0))
      q.processAllAvailable()
      assert(StreamUpsert.latestVersion(store).contains(1))
      assert(snap(store) == Set(
        (1L, ts(30), 3L, "buy", 3.0), (2L, ts(20), 2L, "view", 2.0)))
      // batch 3: new key + intra-batch duplicate (compacted map-side)
      mem.addData(Event(5, ts(40), 3, "click", 4.0), Event(6, ts(50), 3, "click", 5.0))
      q.processAllAvailable()
      val fin = snap(store)
      assert(fin == Set(
        (1L, ts(30), 3L, "buy", 3.0), (2L, ts(20), 2L, "view", 2.0),
        (3L, ts(50), 6L, "click", 5.0)))
      // incremental ≡ backfill: one compaction over all six rows
      val all = Seq(
        Event(1, ts(10), 1, "click", 1.0), Event(2, ts(20), 2, "view", 2.0),
        Event(3, ts(30), 1, "buy", 3.0), Event(4, ts(5), 2, "view", 9.0),
        Event(5, ts(40), 3, "click", 4.0), Event(6, ts(50), 3, "click", 5.0)).toDF()
      val backfill = Upsert.compact(all, keys, ver)
        .select("user_id", "ts", "event_id", "event_type", "value")
        .as[(Long, Timestamp, Long, String, Double)].collect().toSet
      assert(fin == backfill)

      // replay idempotence: redeliver batch 3 (foreachBatch retry) —
      // a new version lands but the STATE is unchanged
      val batch3 = Seq(Event(5, ts(40), 3, "click", 4.0),
        Event(6, ts(50), 3, "click", 5.0)).toDF()
      StreamUpsert.applyBatch(spark, store, batch3, keys, ver)
      assert(StreamUpsert.latestVersion(store).contains(3))
      assert(snap(store) == fin)

      // crash visibility: an uncommitted version dir (no _SUCCESS) is
      // invisible to readers
      val dead = java.nio.file.Paths.get(store, "v00009")
      java.nio.file.Files.createDirectories(dead)
      assert(StreamUpsert.latestVersion(store).contains(3))
    } finally q.stop()
  }

  test("vacuum keeps the newest committed versions, drops expired + orphans, idempotent") {
    val store = java.nio.file.Files
      .createTempDirectory("ups_vacuum").toString + "/snap"
    def versions: Set[String] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(store)
      java.nio.file.Files.list(root).iterator().asScala
        .map(_.getFileName.toString).toSet
    }
    // five committed versions v00000..v00004
    (1 to 5).foreach { i =>
      val b = Seq(Event(i.toLong, ts(i * 10L), i.toLong, "click", i.toDouble)).toDF()
      StreamUpsert.applyBatch(spark, store, b, keys, ver)
    }
    // a crashed writer's orphan BEHIND the committed frontier: strip
    // v00002's commit marker (readers resolve v00004 regardless)
    java.nio.file.Files.delete(java.nio.file.Paths.get(store, "v00002", "_SUCCESS"))
    // an uncommitted dir at frontier+1 is indistinguishable from the one
    // LIVE writer mid-write — vacuum must spare it (the race ADVICE r8
    // flagged: deleting it mid-write fails the in-flight batch)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(store, "v00005"))
    // ... as must anything else ahead of the frontier
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(store, "v00007"))
    // non-version junk is SKIPPED, not a NumberFormatException that
    // aborts the pass: bare "v" (empty digit suffix), >9-digit overflow
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(store, "v"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(store, "v99999999999"))
    val before = snap(store)

    // keep 2: v00003+v00004 survive; expired committed v00000/v00001 and
    // the behind-frontier orphan v00002 go; v00005/v00007 spared
    val deleted2 = StreamUpsert.vacuum(store, keepVersions = 2)
    assert(deleted2 == Seq("v00000", "v00001", "v00002"))
    assert(versions == Set("v00003", "v00004", "v00005", "v00007", "v", "v99999999999"))
    assert(snap(store) == before, "vacuum changed what readers see")

    // keep 1: only the latest committed survives; idempotent second run
    assert(StreamUpsert.vacuum(store, keepVersions = 1) == Seq("v00003"))
    assert(StreamUpsert.vacuum(store, keepVersions = 1).isEmpty)
    assert(snap(store) == before)

    // the spared v00005 slot is exactly where the next writer lands:
    // applyBatch overwrites the uncommitted dir and commits it
    StreamUpsert.applyBatch(spark, store,
      Seq(Event(9, ts(90), 9, "buy", 9.0)).toDF(), keys, ver)
    assert(StreamUpsert.latestVersion(store).contains(5))
    assert(snap(store) == before + ((9L, ts(90), 9L, "buy", 9.0)))
    // frontier is now 5: expired v00004 goes; v00007 is still ahead of
    // it (could be a writer racing THIS pass) — spared again
    assert(StreamUpsert.vacuum(store, keepVersions = 1) == Seq("v00004"))
    assert(versions == Set("v00005", "v00007", "v", "v99999999999"))
  }
}
