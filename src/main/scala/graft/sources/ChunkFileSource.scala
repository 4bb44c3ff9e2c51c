package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{DateType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.nio.file.{Files, Paths}
import java.time.LocalDate

/** Shared landing-dir arithmetic for index-numbered scrape files
  * (`page_00000.json`, `chunk_00003.json`, …): listing, the
  * rotation-safe high-water mark, and path construction — the pieces
  * [[FeedPageSource]] and [[ChunkFileSource]] have in common.
  */
private[sources] object IndexedFiles {
  def indices(dir: String, prefix: String): Seq[Long] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val re = (java.util.regex.Pattern.quote(prefix) + "_(\\d+)\\.json").r
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .map(_.getFileName.toString)
          .collect { case re(idx) => idx.toLong }
          .toSeq.sorted
      } finally s.close()
    }
  }

  /** Max landed index + 1 — NOT the file count, so consumed files can be
    * rotated/archived without the offset walking backwards (both
    * scrapers write in index order, one atomic write per file).
    */
  def highWater(dir: String, prefix: String): Long =
    indices(dir, prefix).lastOption.map(_ + 1L).getOrElse(0L)

  def path(dir: String, prefix: String, idx: Long): java.nio.file.Path =
    Paths.get(dir, f"${prefix}_$idx%05d.json")
}

/** S4 as a DataSource V2 micro-batch source (the same treatment the feed
  * cursor got in [[FeedPageSource]]): the time-chunk scraper's files
  * (`chunk_00000.json`, one per tumbling [start, end) date window)
  * become a STREAM whose offset is the chunk index — the reference's
  * persisted `current_chunk` cursor (CTScraper.py:156-159) owned by
  * Structured Streaming's offset log. Restarting a query resumes at the
  * committed chunk, never re-reading or skipping one, while
  * [[ChunkScraper]] keeps appending.
  *
  * Rows are (chunk_id, chunk_start, chunk_end, json): the window bounds
  * are recomputed from the source options exactly as
  * [[ScrapeChunks.dateChunks]] plans them (CTConfig.py:5-32), so
  * downstream never re-derives scrape-range arithmetic.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.ChunkFileSource")
  *     .option("path", landingDir)
  *     .option("start", "2024-01-01").option("end", "2024-03-01")
  *     .option("chunkDays", "7").load()
  * }}}
  */
class ChunkFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChunkFileSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ChunkFileTable(ChunkWindows(
      properties.get("path"),
      properties.get("start"), properties.get("end"),
      Option(properties.get("chunkdays")).orElse(Option(properties.get("chunkDays")))
        .map(_.toInt).getOrElse(7)))
}

object ChunkFileSource {
  val Prefix = "chunk"
  val schema: StructType = StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("chunk_start", DateType, nullable = false),
    StructField("chunk_end", DateType, nullable = false),
    StructField("json", StringType)))
}

/** Scrape-range config + window arithmetic (mirrors
  * [[ScrapeChunks.dateChunks]]: tumbling `chunkDays` windows, the last
  * one clipped to `end`).
  */
private[sources] case class ChunkWindows(dir: String, start: String, end: String,
                                         chunkDays: Int) {
  require(dir != null, "option 'path' (the chunk landing dir) is required")
  require(start != null && end != null,
    "options 'start' and 'end' (the scrape date range) are required")
  private val s = LocalDate.parse(start)
  private val e = LocalDate.parse(end)
  def startOf(idx: Long): LocalDate = s.plusDays(idx * chunkDays)
  def endOf(idx: Long): LocalDate = {
    val n = startOf(idx).plusDays(chunkDays)
    if (n.isAfter(e)) e else n
  }
  def row(idx: Long): InternalRow = {
    val body = new String(
      Files.readAllBytes(IndexedFiles.path(dir, ChunkFileSource.Prefix, idx)), "UTF-8")
    InternalRow(idx, startOf(idx).toEpochDay.toInt, endOf(idx).toEpochDay.toInt,
      UTF8String.fromString(body))
  }
}

private class ChunkFileTable(w: ChunkWindows) extends Table with SupportsRead {
  override def name(): String = s"scrape_chunks(${w.dir})"
  override def schema(): StructType = ChunkFileSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ChunkFileScan(w)
    }
}

private class ChunkFileScan(w: ChunkWindows) extends Scan {
  override def readSchema(): StructType = ChunkFileSource.schema
  override def description(): String = s"ChunkFileScan(${w.dir})"
  override def toBatch: Batch = new Batch {
    // batch (backfill) plans the chunks that EXIST — a rotated landing
    // dir backfills its remaining window instead of failing on gaps
    override def planInputPartitions(): Array[InputPartition] =
      IndexedFiles.indices(w.dir, ChunkFileSource.Prefix)
        .map(i => ChunkFilePartition(w, i): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new ChunkFileReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChunkFileStream(w)
}

/** Offset = number of chunks fully consumed (the `current_chunk` cursor). */
private case class ChunksOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private class ChunkFileStream(w: ChunkWindows) extends MicroBatchStream {
  // fresh query over a rotated dir: start at the lowest surviving chunk
  override def initialOffset(): Offset =
    ChunksOffset(IndexedFiles.indices(w.dir, ChunkFileSource.Prefix)
      .headOption.getOrElse(0L))
  // the scraper's persisted cursor keeps the offset monotone even if
  // EVERY landed file has been rotated away (file high-water alone
  // would walk backwards to 0 and re-plan committed chunks)
  override def latestOffset(): Offset =
    ChunksOffset(math.max(IndexedFiles.highWater(w.dir, ChunkFileSource.Prefix),
      ChunkScraper.currentChunk(w.dir)))
  override def deserializeOffset(json: String): Offset = ChunksOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = () // chunk files stay for replay/backfill
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    // intersect with existing files (gap tolerance, as the batch path)
    val existing = IndexedFiles.indices(w.dir, ChunkFileSource.Prefix).toSet
    (start.asInstanceOf[ChunksOffset].n until end.asInstanceOf[ChunksOffset].n)
      .filter(existing)
      .map(i => ChunkFilePartition(w, i): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new ChunkFileReaderFactory
}

private case class ChunkFilePartition(w: ChunkWindows, idx: Long) extends InputPartition

private class ChunkFileReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChunkFilePartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done
      override def get(): InternalRow = { done = true; p.w.row(p.idx) }
      override def close(): Unit = ()
    }
  }
}

/** Driver-side chunk fetch loop (ref: CTScraper.py:98-164): iterates the
  * planned windows in order, persisting each response as
  * `chunk_<n>.json` plus an explicit `current_chunk` cursor file — the
  * exact resume value the reference persists (:156-159). The cursor
  * file (not the landed files) is the authoritative checkpoint, so
  * consumed chunks can be rotated/archived out of the landing dir
  * without the scraper re-fetching them; the landed-file high-water
  * mark is only a fallback for dirs written before the cursor existed.
  * Kept outside Catalyst for the same reason as [[FeedPager]]:
  * rate-limited, non-idempotent calls must not live in a
  * task-retryable operator.
  */
object ChunkScraper {
  private def cursorPath(dir: String) = Paths.get(dir, "current_chunk")
  /** The next chunk index to fetch: the persisted `current_chunk`
    * cursor, or the landed-file high-water mark for pre-cursor dirs.
    */
  def currentChunk(dir: String): Long = {
    val p = cursorPath(dir)
    if (Files.exists(p)) Files.readString(p).trim.toLong
    else IndexedFiles.highWater(dir, ChunkFileSource.Prefix)
  }
  private def persistCursor(dir: String, idx: Long): Unit = {
    val tmp = cursorPath(dir).resolveSibling("current_chunk.tmp")
    Files.writeString(tmp, idx.toString)
    Files.move(tmp, cursorPath(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Fetch up to `maxChunks` NEW chunks (resuming at [[currentChunk]]),
    * retrying each window up to `maxTries`; a window that exhausts its
    * budget aborts the run (resumable — the landed files and cursor
    * already persist progress). Returns the new cursor.
    */
  def run(dir: String, start: String, end: String, chunkDays: Int,
          maxChunks: Int, maxTries: Int)
         (fetch: (LocalDate, LocalDate) => Either[String, String]): Long = {
    val w = ChunkWindows(dir, start, end, chunkDays)
    Files.createDirectories(Paths.get(w.dir))
    var idx = currentChunk(dir)
    var fetched = 0
    while (fetched < maxChunks && w.startOf(idx).isBefore(LocalDate.parse(w.end))) {
      var tries = 0
      var body: Option[String] = None
      while (body.isEmpty && tries < maxTries) {
        tries += 1
        fetch(w.startOf(idx), w.endOf(idx)) match {
          case Right(b) => body = Some(b)
          case Left(_) => ()
        }
      }
      body match {
        case None => return idx // retry budget exhausted — resume later
        case Some(b) =>
          val path = IndexedFiles.path(w.dir, ChunkFileSource.Prefix, idx)
          val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
          Files.writeString(tmp, b)
          Files.move(tmp, path,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          idx += 1
          fetched += 1
          persistCursor(w.dir, idx) // chunk landed, THEN cursor advances
      }
    }
    idx
  }
}
