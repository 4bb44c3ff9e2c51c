package graft.streaming

import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** foreachBatch CDC-APPLY: maintain a latest-wins keyed snapshot store
  * on plain parquet across streaming micro-batches — the production
  * deployment of x06's upsert merge (ref analog: the scrapers re-land
  * updated posts continuously; DataStorage.py only ever appends). Each
  * batch merges into the CURRENT snapshot and writes the result as a
  * NEW versioned directory (`v00000`, `v00001`, …); readers resolve the
  * highest version whose `_SUCCESS` marker exists (io08's
  * commit-visibility story with Spark's own write marker as the
  * commit), so a batch that dies mid-write is invisible and earlier
  * versions remain for time travel.
  *
  * Retry safety: latest-wins merge is IDEMPOTENT on replay — a
  * foreachBatch redelivery re-merges rows that are already at their
  * final version and changes nothing except writing an equal snapshot
  * under a fresh version id (UpsertStreamSpec pins this).
  *
  * Scale shape: per batch, one keyed full-outer join of O(store) vs
  * O(batch) — the store side is a plain parquet scan (bucketable on
  * the key in a real lake), the batch side is compacted map-side
  * first; nothing driver-side. Old versions are retired by io06-style
  * compaction/GC, not by this operator.
  */
object StreamUpsert {

  private def versionOf(name: String): Option[Int] =
    if (name.startsWith("v") && name.drop(1).forall(_.isDigit))
      Some(name.drop(1).toInt)
    else None

  /** Highest committed (has `_SUCCESS`) snapshot version, if any. */
  def latestVersion(store: String): Option[Int] = {
    val root = Paths.get(store)
    if (!Files.isDirectory(root)) None
    else {
      import scala.jdk.CollectionConverters._
      Files.list(root).iterator().asScala
        .flatMap(p => versionOf(p.getFileName.toString))
        .filter(v => Files.exists(Paths.get(store, f"v$v%05d", "_SUCCESS")))
        .reduceOption(_ max _)
    }
  }

  def readSnapshot(spark: SparkSession, store: String): Option[DataFrame] =
    latestVersion(store).map(v => spark.read.parquet(f"$store/v$v%05d"))

  /** Merge one micro-batch into the store (the foreachBatch body). */
  def applyBatch(spark: SparkSession, store: String, batch: DataFrame,
                 keys: Seq[String], version: Seq[String]): Unit = {
    val cur = latestVersion(store)
    val merged = cur match {
      case Some(v) =>
        Upsert.latestWins(
          spark.read.parquet(f"$store/v$v%05d"), batch, keys, version)
      case None => Upsert.compact(batch, keys, version)
    }
    val next = cur.map(_ + 1).getOrElse(0)
    merged.write.mode("overwrite").parquet(f"$store/v$next%05d")
  }

  /** VACUUM — retention for the versioned store: keep the newest
    * `keepVersions` COMMITTED snapshots, delete every older version dir
    * and every uncommitted (no `_SUCCESS`) dir — the crashed-writer
    * orphans readers already cannot see. Never touches the latest
    * committed version, so a concurrent [[readSnapshot]] is safe: it
    * resolves the latest committed version, which vacuum preserves by
    * construction. Idempotent — a re-run finds nothing older to drop.
    *
    * Returns the deleted directory names (deterministic order) so the
    * caller can audit what a retention pass removed.
    */
  def vacuum(store: String, keepVersions: Int = 1): Seq[String] = {
    require(keepVersions >= 1, "vacuum must keep at least the latest version")
    val root = Paths.get(store)
    if (!Files.isDirectory(root)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val dirs = Files.list(root).iterator().asScala
      .filter(Files.isDirectory(_)).toSeq
    val committed = dirs
      .flatMap(p => versionOf(p.getFileName.toString).map(_ -> p))
      .filter { case (v, _) => Files.exists(Paths.get(store, f"v$v%05d", "_SUCCESS")) }
      .sortBy(-_._1)
    val keep = committed.take(keepVersions).map(_._2.getFileName.toString).toSet
    val doomed = dirs
      .filter(p => !keep.contains(p.getFileName.toString))
      // a version dir without _SUCCESS is an orphan (invisible to
      // readers); a committed one outside the keep window is expired
      .filter(p => versionOf(p.getFileName.toString).isDefined)
      .sortBy(_.getFileName.toString)
    doomed.foreach { d =>
      val all = Files.walk(d)
      try all.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally all.close()
    }
    doomed.map(_.getFileName.toString)
  }
}
