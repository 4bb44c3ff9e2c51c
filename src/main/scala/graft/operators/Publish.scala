package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic snapshot PUBLISH for a parquet lake without a table format —
  * the manifest-pointer pattern (Iceberg/Delta's core idea reduced to
  * plain files) that makes multi-batch ingestion crash-safe and readers
  * snapshot-isolated when all you have is a filesystem:
  *
  *   root/data/<batch>/...          immutable data directories
  *   root/_manifests/m-00001.txt    one data-dir name per line
  *   root/_manifests/m-00002.txt    ...
  *
  * The CURRENT snapshot is the highest-numbered COMPLETE manifest.
  * Writers stage `m-<k>.txt.tmp` and RENAME it into place — rename is
  * an atomic create-new on POSIX and HDFS, and never overwrites — so a
  * reader can never observe a half-written manifest, and a writer that
  * dies mid-publish leaves only an invisible `.tmp` (plus an orphaned
  * data dir no manifest references). There is no mutable `_CURRENT`
  * pointer to swap, hence no overwrite-atomicity problem at all.
  *
  * Properties this buys at 100 TB (PublishSpec pins each):
  *  - a crashed writer's half-published batch is INVISIBLE to readers
  *    (data dir present, manifest absent);
  *  - a leftover `.tmp` manifest is never read;
  *  - re-publishing an already-listed batch name is idempotent (the new
  *    manifest does not list it twice);
  *  - old manifests remain readable — `readVersion` is time travel, and
  *    a reader that resolved version k keeps a consistent snapshot even
  *    while version k+1 lands.
  *
  * The reference lands each scrape chunk as its own file and readers
  * glob the directory (DataStorage.py chunked writes) — which reads
  * half-written output on a crash; this is the contract that pattern is
  * missing.
  */
object Publish {

  private def fs(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private val ManifestRe = "m-(\\d{5})\\.txt".r

  /** (version, path) of every complete manifest under root, ascending. */
  private def manifests(spark: SparkSession, root: String)
      : Seq[(Int, org.apache.hadoop.fs.Path)] = {
    val (hfs, _) = fs(spark, root)
    val dir = new org.apache.hadoop.fs.Path(s"$root/_manifests")
    if (!hfs.exists(dir)) Seq.empty
    else hfs.listStatus(dir).toSeq
      .flatMap(st => st.getPath.getName match {
        case ManifestRe(k) => Some((k.toInt, st.getPath))
        case _             => None // .tmp and foreign files are invisible
      })
      .sortBy(_._1)
  }

  /** Current snapshot version (0 = nothing published). */
  def currentVersion(spark: SparkSession, root: String): Int =
    manifests(spark, root).lastOption.map(_._1).getOrElse(0)

  /** Batch names listed by manifest `version` (current if unspecified). */
  def batches(spark: SparkSession, root: String, version: Int = -1): Seq[String] = {
    val ms = manifests(spark, root)
    val pick = if (version < 0) ms.lastOption else ms.find(_._1 == version)
    pick match {
      case None => Seq.empty
      case Some((_, path)) =>
        val (hfs, _) = fs(spark, root)
        val in = hfs.open(path)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toList
        finally in.close()
    }
  }

  /** Write `df` as an immutable batch dir, then commit a new manifest =
    * previous batches + this one (idempotent on the batch name). The
    * data write happens BEFORE the manifest commit, so a crash anywhere
    * leaves the previous snapshot intact. Returns the new version.
    */
  def publishBatch(spark: SparkSession, df: DataFrame, root: String,
                   batch: String): Int = {
    require(!batch.contains('/') && batch.nonEmpty,
      s"batch name must be a single path segment, got '$batch'")
    df.write.mode("overwrite").parquet(s"$root/data/$batch")
    val prev = batches(spark, root)
    val next = if (prev.contains(batch)) prev else prev :+ batch
    commitManifest(spark, root, next)
  }

  /** Stage + atomically rename the next manifest listing `names`. */
  private def commitManifest(spark: SparkSession, root: String,
                             names: Seq[String]): Int = {
    val (hfs, _) = fs(spark, root)
    val k = currentVersion(spark, root) + 1
    val dir = new org.apache.hadoop.fs.Path(s"$root/_manifests")
    hfs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(f"$root/_manifests/m-$k%05d.txt.tmp")
    val fin = new org.apache.hadoop.fs.Path(f"$root/_manifests/m-$k%05d.txt")
    val out = hfs.create(tmp, true)
    try out.write((names.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(hfs.rename(tmp, fin),
      s"manifest commit lost the race for version $k — retry the publish")
    k
  }

  /** The snapshot a manifest defines: exactly the listed batch dirs —
    * orphaned data dirs (crashed writers) are never read. None before
    * the first publish.
    */
  def readSnapshot(spark: SparkSession, root: String,
                   version: Int = -1): Option[DataFrame] = {
    val bs = batches(spark, root, version)
    if (bs.isEmpty) None
    else Some(spark.read.parquet(bs.map(b => s"$root/data/$b"): _*))
  }

  /** INCREMENTAL consumption — file-level CDC off the manifest chain:
    * the batch dirs that `toVersion` (current if unspecified) lists and
    * `sinceVersion` does not (`sinceVersion = 0` = from the beginning).
    * A downstream consumer that remembers the last version it processed
    * reads ONLY the new batches — O(increment) I/O, never a snapshot
    * rescan — and because committed batches are IMMUTABLE (publishBatch
    * never rewrites a committed name), processed-state + increment
    * reconstructs the new snapshot exactly (PublishSpec pins it). None
    * when nothing new. This is the consumption story the reference's
    * re-glob-everything landing (DataStorage.py) cannot offer.
    */
  def readIncrement(spark: SparkSession, root: String, sinceVersion: Int,
                    toVersion: Int = -1): Option[DataFrame] = {
    val before = batches(spark, root, sinceVersion).toSet
    val fresh = batches(spark, root, toVersion).filterNot(before)
    if (fresh.isEmpty) None
    else Some(spark.read.parquet(fresh.map(b => s"$root/data/$b"): _*))
  }
}
