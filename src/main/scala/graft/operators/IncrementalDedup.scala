package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental exact dedup against a persistent corpus-key store — the
  * ingestion shape a 100 TB training-data pipeline needs: each new batch
  * is deduped (a) within itself and (b) against every previously-ingested
  * key via one keyed anti-join, then its fresh keys are appended to the
  * store. Work per batch is O(batch) + one shuffle on the key — never
  * O(corpus), unlike the reference, which re-reads its whole CSV and
  * drop_duplicates on every run (Preprocessor.py:161-167).
  *
  * The store is a parquet directory holding ONE narrow column (`__key`);
  * at cluster scale write it bucketed by `__key` (operators/Bucketing)
  * so the anti-join co-locates without an exchange on the store side.
  *
  * Crash/retry safety: the key append is at-least-once. Duplicate keys in
  * the store are harmless — anti-join semantics are unchanged — so a
  * retried batch is simply a no-op (its keys are already present) and the
  * store needs no transactional table format, only append.
  */
object IncrementalDedup {

  /** Keys previously ingested (empty frame if the store doesn't exist). */
  def readStore(spark: SparkSession, storeDir: String): DataFrame = {
    val p = java.nio.file.Paths.get(storeDir)
    val exists = java.nio.file.Files.isDirectory(p) && {
      val s = java.nio.file.Files.list(p)
      try s.anyMatch(f => f.toString.endsWith(".parquet")) finally s.close()
    }
    if (exists) spark.read.parquet(storeDir)
    else {
      import spark.implicits._
      Seq.empty[Long].toDF("__key")
    }
  }

  /** Dedupe `batch` within itself (first row per key by `order`) and
    * against the store; append the survivors' keys; return the surviving
    * rows. `key` must be a LongType expression (e.g.
    * `TextFunctions.rollingHash(col("text"))` — the exact-dedup content
    * key at scale).
    *
    * The survivors are STAGED (write-then-read) before the key append:
    * a merely-persisted anti-join plan still references the store path,
    * and Spark invalidates exactly such caches when the append touches
    * that path — the returned frame would silently anti-join against the
    * keys its own write just added and lose every row. The staged parquet
    * is also the batch's durable materialization point: a crash between
    * stage and append re-runs the batch idempotently.
    */
  def dedupeBatch(batch: DataFrame, key: Column, order: Seq[Column],
                  storeDir: String): DataFrame = {
    val spark = batch.sparkSession
    val withKey = batch.withColumn("__key", key)
    val inBatch = Dedup.dedupFirst(withKey, Seq("__key"), order)
    registerStagedCleanup(storeDir)
    val staged = s"$storeDir.staged/${java.util.UUID.randomUUID()}"
    inBatch
      .join(readStore(spark, storeDir), Seq("__key"), "left_anti")
      .write.parquet(staged)
    val fresh = spark.read.parquet(staged)
    fresh.select("__key").write.mode("append").parquet(storeDir)
    fresh.drop("__key")
  }

  /** Staged dirs cannot be deleted inside [[dedupeBatch]] — the returned
    * frame lazily reads from its own staged parquet. Long-running
    * ingestion calls this between batches, once the previous batch's
    * returned frame is consumed; a JVM shutdown hook (registered on first
    * use per store) sweeps whatever remains on exit, so staged copies
    * never outlive the process.
    */
  def cleanupStaged(storeDir: String): Unit = {
    val root = java.nio.file.Paths.get(s"$storeDir.staged")
    if (java.nio.file.Files.isDirectory(root)) {
      import scala.jdk.CollectionConverters._
      val all = java.nio.file.Files.walk(root)
      try all.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally all.close()
    }
  }

  private val cleanupHooks = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def registerStagedCleanup(storeDir: String): Unit =
    if (cleanupHooks.add(storeDir))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try cleanupStaged(storeDir) catch { case _: Throwable => () }))
}
