package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.nio.file.{Files, Paths}

/** DataSource V2 micro-batch source over a [[FeedPager]] landing
  * directory (SURVEY §4 extension-ladder tier (c): a whole-source
  * integration the built-ins don't cover): the scraper's page files
  * (`page_00000.json`, numbered by fetch order) become a STREAM whose
  * offset is the page index — the exact cursor-position checkpoint the
  * reference persists between scrape runs (InstagramFeedScraper.py:66-74),
  * now owned by Structured Streaming's offset log. Restarting a query
  * resumes at the committed page, never re-reading or skipping a page,
  * while the scraper keeps appending.
  *
  * Rows are (page_idx, json); downstream parses with the
  * `PostExtract` schema'd `from_json` path. Batch reads (backfill) see
  * every page through the same table.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.FeedPageSource")
  *     .option("path", landingDir).load()
  * }}}
  */
class FeedPageSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FeedPageSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new FeedPageTable(properties.get("path"))
}

object FeedPageSource {
  val schema: StructType = StructType(Seq(
    StructField("page_idx", LongType, nullable = false),
    StructField("json", StringType)))

  private val Prefix = "page"

  /** Page indices currently landed (batch reads plan exactly these). */
  def pageIndices(dir: String): Seq[Long] = IndexedFiles.indices(dir, Prefix)

  /** Streaming high-water mark: max landed index + 1 — NOT the file
    * count, so consumed pages can be rotated/archived out of the landing
    * dir without the offset walking backwards (FeedPager writes pages in
    * index order, one atomic write per page, so every index < the max is
    * already landed or intentionally rotated away).
    */
  def pageCount(dir: String): Long = IndexedFiles.highWater(dir, Prefix)

  def pagePath(dir: String, idx: Long): java.nio.file.Path =
    IndexedFiles.path(dir, Prefix, idx)
}

private class FeedPageTable(dir: String) extends Table with SupportsRead {
  require(dir != null, "option 'path' (the FeedPager landing dir) is required")
  override def name(): String = s"feed_pages($dir)"
  override def schema(): StructType = FeedPageSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new FeedPageScan(dir)
    }
}

private class FeedPageScan(dir: String) extends Scan {
  override def readSchema(): StructType = FeedPageSource.schema
  override def description(): String = s"FeedPageScan($dir)"
  override def toBatch: Batch = new Batch {
    // batch (backfill) plans the pages that EXIST — a rotated landing
    // dir backfills its remaining window instead of failing on gaps
    override def planInputPartitions(): Array[InputPartition] =
      FeedPageSource.pageIndices(dir)
        .map(i => FeedPagePartition(dir, i): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory = new FeedPageReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FeedPageStream(dir)
}

/** Offset = number of pages fully consumed (the FeedPager cursor index). */
private case class PagesOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private class FeedPageStream(dir: String) extends MicroBatchStream {
  // a FRESH query over an already-rotated landing dir starts at the
  // lowest page still present (backfilling the remaining window like
  // toBatch does), not at 0 — index 0 may have been archived away
  override def initialOffset(): Offset =
    PagesOffset(FeedPageSource.pageIndices(dir).headOption.getOrElse(0L))
  override def latestOffset(): Offset = PagesOffset(FeedPageSource.pageCount(dir))
  override def deserializeOffset(json: String): Offset = PagesOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = () // page files stay for replay/backfill
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    FeedPageStream.partitions(dir,
      start.asInstanceOf[PagesOffset].n, end.asInstanceOf[PagesOffset].n)
  override def createReaderFactory(): PartitionReaderFactory = new FeedPageReaderFactory
}

private object FeedPageStream {
  /** One partition per page: fetch-bound work parallelizes per page, and
    * a straggler page never blocks the rest of the batch. Planned pages
    * are intersected with the files that EXIST (same gap tolerance as
    * the batch path): pages inside [start, end) can be rotated away
    * between runs — or between offset resolution and planning — and a
    * partition for a rotated page would fail the whole query.
    */
  def partitions(dir: String, start: Long, end: Long): Array[InputPartition] = {
    val existing = FeedPageSource.pageIndices(dir).toSet
    (start until end).filter(existing)
      .map(i => FeedPagePartition(dir, i): InputPartition).toArray
  }
}

private case class FeedPagePartition(dir: String, idx: Long) extends InputPartition

private class FeedPageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FeedPagePartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done
      override def get(): InternalRow = {
        done = true
        val body = new String(
          Files.readAllBytes(FeedPageSource.pagePath(p.dir, p.idx)), "UTF-8")
        InternalRow(p.idx, UTF8String.fromString(body))
      }
      override def close(): Unit = ()
    }
  }
}
